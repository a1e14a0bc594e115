"""Search the Mesa-clipper convention space for the bit-exact
reproduction of llvmpipe's varying planes on SCALED (clipped) quads.

Builds the two strip triangles of the gb-pass0-style scaled quad,
clips them with tools/clip_emu.py, sets up llvmpipe attribute planes
per fan triangle, rasterizes ownership, and bit-compares the composed
grid against the real GL oracle at video_scale 3..7.

Usage: python tools/probe_plane_clip.py
"""

from __future__ import annotations

import itertools
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.clip_emu import Vert, clip_tri, fan_tris
from tools.probe_plane_6x import FS, VS, IH, IW, OH, OW, corners_np
from retrocapture_tpu.parity.oracle import GLOracle
from retrocapture_tpu.runtime.engine import (
    _plane_component,
    _plane_setup_f32_pos,
    _snap16,
)

f = np.float32


def strip_tris(gp, tex, viewport):
    """The two triangles Mesa sees: strip (v0,v1,v2) + (v1,v3,v2),
    corner indexing [row r = y][col c = x]: v0=(0,0) v1=(1,0) v2=(0,1)
    v3=(1,1) in (c,r)."""
    ow2, oh2 = viewport

    def vert(r, c):
        clip = gp[r, c]
        oow = f(f(1.0) / f(clip[3]))
        sx = f(f(f(f(clip[0]) * oow) * f(ow2)) + f(ow2))
        sy = f(f(f(f(clip[1]) * oow) * f(oh2)) + f(oh2))
        return Vert(clip, tex[r, c], (sx, sy))

    v0, v1, v2, v3 = vert(0, 0), vert(0, 1), vert(1, 0), vert(1, 1)
    return [(v0, v1, v2), (v1, v3, v2)]


def tri_grid(tri, k, snap):
    """llvmpipe plane of attribute k over the full grid for one
    triangle, or None."""
    pts = []
    for v in tri:
        sx, sy = v.screen
        if snap:
            sx, sy = _snap16(sx), _snap16(sy)
        pts.append((sx, sy))
    plane = _plane_setup_f32_pos(
        pts[0], pts[1], pts[2], tri[0].attrs[k], tri[1].attrs[k], tri[2].attrs[k]
    )
    if plane is None:
        return None
    return _plane_component(*plane, OW, OH)


def tri_cover(tri, snap):
    """Double-precision coverage of sample points (ix+.5, iy+.5); ties
    get the top-left rule on the 1/16-snapped edge functions."""
    pts = []
    for v in tri:
        sx, sy = v.screen
        if snap:
            sx, sy = _snap16(sx), _snap16(sy)
        pts.append((float(sx), float(sy)))
    xs = np.arange(OW, dtype=np.float64)[None, :] + 0.5
    ys = np.arange(OH, dtype=np.float64)[:, None] + 0.5
    cover = np.ones((OH, OW), bool)
    n = 3
    area = 0.0
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        area += x1 * y2 - x2 * y1
    sgn = 1.0 if area > 0 else -1.0
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        e = sgn * ((x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1))
        # top-left tie rule in the sgn-corrected winding:
        dx, dy = sgn * (x2 - x1), sgn * (y2 - y1)
        top_left = (dy < 0) or (dy == 0 and dx > 0)
        cover &= (e > 0) | ((e == 0) & top_left)
    return cover


def compose(tris, k, snap):
    grid = np.full((OH, OW), np.nan, np.float32)
    covered = np.zeros((OH, OW), bool)
    for tri in tris:
        g = tri_grid(tri, k, snap)
        if g is None:
            continue
        c = tri_cover(tri, snap)
        take = c & ~covered
        grid[take] = g[take]
        covered |= c
    return grid, covered


def main():
    orc = GLOracle()
    mvp = [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0]
    viewport = (OW / 2.0, OH / 2.0)
    oracle = {}
    for s in (3.0, 4.0, 5.0, 6.0, 7.0):
        oracle[s] = orc.run_pass(
            VS, FS, OW, OH, textures=[], uniforms=[
                ("MVPMatrix", "m4", mvp),
                ("OutputSize", "2f", [float(OW), float(OH)]),
                ("InputSize", "2f", [IW, IH]),
                ("video_scale", "f", [s]),
            ], fbo="rgba32f",
        )[..., :2]
    orc.close()

    order = ("x+", "x-", "y+", "y-")
    best = []
    for tconv, lerp_form, snap in itertools.product(
        ("out", "in", "prev"), ("d", "w"), (True, False)
    ):
        worst = 0.0
        detail = []
        for s in (3.0, 4.0, 5.0, 6.0, 7.0):
            gp, tex = corners_np(s)
            tris = []
            for tri in strip_tris(gp, tex, viewport):
                poly = clip_tri(tri, order, viewport, tconv, lerp_form)
                tris.extend(fan_tris(poly) if len(poly) >= 3 else [])
            fr = 0.0
            for k in range(2):
                g, cov = compose(tris, k, snap)
                o = oracle[s][..., k]
                mism = (g.view(np.int32) != o.view(np.int32)) | ~cov
                fr = max(fr, float(mism.mean()))
            detail.append(f"{s:.0f}:{fr:.2e}")
            worst = max(worst, fr)
        print(f"tconv={tconv} lerp={lerp_form} snap={snap}: worst={worst:.3e}"
              f"  [{' '.join(detail)}]", flush=True)
        best.append((worst, tconv, lerp_form, snap))
    best.sort()
    print("BEST:", best[0])


if __name__ == "__main__":
    main()
