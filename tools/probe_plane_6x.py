"""Probe llvmpipe's varying plane equations for SCALED gl_Position quads
(the handheld/console-border "alt" vertex shaders divide clip position
by outsize/scaled_video_out — ShaderEngine renders them as-is, and the
rasterized quad covers a super-region of the viewport).

gl_parity_r2.json shows the three *-alt-6x presets at ~26 dB while the
same presets at 2x..5x/7x sit at 64 dB..bit-exact. This probe renders a
minimal gb-pass0-style vertex stage through the real GL oracle with an
RGBA32F framebuffer at the sweep geometry (InputSize 320x240, viewport
640x480), recovers the exact per-pixel varying grid per video_scale,
and bit-compares it against our `_plane_setup_f32_pos` reconstruction
plus candidate variants. Output: per scale, which candidate (if any)
matches llvmpipe bit-for-bit, and the ulp histogram of the shipped one.

Usage: python tools/probe_plane_6x.py [scales...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from retrocapture_tpu.parity.oracle import GLOracle
from retrocapture_tpu.runtime.engine import (
    _plane_component,
    _plane_setup_f32_pos,
    _quad_screen_corners,
)

IW, IH = 320.0, 240.0
OW, OH = 640, 480

VS = """
attribute vec4 VertexCoord;
attribute vec4 TexCoord;
varying vec4 TEX0;
uniform mat4 MVPMatrix;
uniform vec2 OutputSize;
uniform vec2 InputSize;
uniform float video_scale;
#define outsize vec4(OutputSize, 1.0 / OutputSize)
#define half_pixel (vec2(0.5) * outsize.zw)
void main()
{
    vec2 scaled_video_out = (InputSize.xy * vec2(video_scale));
    gl_Position = MVPMatrix * VertexCoord / vec4( vec2(outsize.xy / scaled_video_out), 1.0, 1.0 );
    TEX0.xy = TexCoord.xy + half_pixel;
}
"""

FS = """
varying vec4 TEX0;
void main() { gl_FragColor = vec4(TEX0.xy, 0.0, 1.0); }
"""


def corners_np(scale: float):
    """Mirror the vertex math in f32 numpy: clip corners + TEX0 corners."""
    f = np.float32
    outw, outh = f(OW), f(OH)
    sw, sh = f(f(IW) * f(scale)), f(f(IH) * f(scale))
    divx, divy = f(outw / sw), f(outh / sh)
    # VertexCoord corners (x, y): (-1,-1) (1,-1) (-1,1) (1,1); MVP = I
    gp = np.zeros((2, 2, 4), np.float32)
    for r, vy in ((0, f(-1.0)), (1, f(1.0))):
        for c, vx in ((0, f(-1.0)), (1, f(1.0))):
            gp[r, c] = [f(vx / divx), f(vy / divy), 0.0, 1.0]
    half_px = (f(0.5) / outw, f(0.5) / outh)
    tex = np.zeros((2, 2, 2), np.float32)
    for r, ty in ((0, f(0.0)), (1, f(1.0))):
        for c, tx in ((0, f(0.0)), (1, f(1.0))):
            tex[r, c] = [f(tx + half_px[0]), f(ty + half_px[1])]
    return gp, tex


def ours(gp, tex, variant: str):
    qc = _quad_screen_corners(gp, OW, OH)
    if qc is None:
        return None
    (qsx, qsy), _ = qc
    grids = []
    for k in range(2):
        c00, c10, c01, c11 = (
            tex[0, 0, k],
            tex[0, 1, k],
            tex[1, 0, k],
            tex[1, 1, k],
        )
        if variant == "ship":  # shipped: triangle (v1, v3, v2)
            plane = _plane_setup_f32_pos(
                (qsx[0, 1], qsy[0, 1]),
                (qsx[1, 1], qsy[1, 1]),
                (qsx[1, 0], qsy[1, 0]),
                c10,
                c11,
                c01,
            )
        elif variant == "t012":  # first triangle (v0, v1, v2)
            plane = _plane_setup_f32_pos(
                (qsx[0, 0], qsy[0, 0]),
                (qsx[0, 1], qsy[0, 1]),
                (qsx[1, 0], qsy[1, 0]),
                c00,
                c10,
                c01,
            )
        elif variant == "nosnap":
            f = np.float32
            sx = ((gp[..., 0] * 0.5 + 0.5) * OW).astype(f)
            sy = ((gp[..., 1] * 0.5 + 0.5) * OH).astype(f)
            plane = _plane_setup_f32_pos(
                (sx[0, 1], sy[0, 1]),
                (sx[1, 1], sy[1, 1]),
                (sx[1, 0], sy[1, 0]),
                c10,
                c11,
                c01,
            )
        else:
            raise ValueError(variant)
        if plane is None:
            return None
        grids.append(_plane_component(*plane, OW, OH))
    return np.stack(grids, axis=-1)


def ulp_stats(a, b):
    av = a.astype(np.float32).view(np.int32).astype(np.int64)
    bv = b.astype(np.float32).view(np.int32).astype(np.int64)
    d = np.abs(av - bv)
    return int(d.max()), float((d != 0).mean())


def main():
    scales = [float(s) for s in sys.argv[1:]] or [2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    orc = GLOracle()
    mvp = [1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0]
    for s in scales:
        out = orc.run_pass(
            VS,
            FS,
            OW,
            OH,
            textures=[],
            uniforms=[
                ("MVPMatrix", "m4", mvp),
                ("OutputSize", "2f", [float(OW), float(OH)]),
                ("InputSize", "2f", [IW, IH]),
                ("video_scale", "f", [s]),
            ],
            fbo="rgba32f",
        )[..., :2]
        gp, tex = corners_np(s)
        print(f"scale {s}: gl corners x={sorted(set(gp[...,0].ravel().tolist()))} "
              f"y={sorted(set(gp[...,1].ravel().tolist()))}")
        for variant in ("ship", "t012", "nosnap"):
            g = ours(gp, tex, variant)
            if g is None:
                print(f"  {variant}: unavailable")
                continue
            mx, fr = ulp_stats(out, g)
            tag = "MATCH" if mx == 0 else f"max_ulp={mx} frac={fr:.2e}"
            print(f"  {variant}: {tag}")
    orc.close()


if __name__ == "__main__":
    main()
