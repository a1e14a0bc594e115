"""Mesa draw-stage clipper emulation (probe side).

handheld/console-border "alt" vertex shaders scale gl_Position so the
quad covers a super-region of the viewport; Mesa's draw module then
geometrically clips each strip triangle against the view frustum
(Sutherland-Hodgman over the fixed planes), re-interpolating vertex
attributes in f32 at each new vertex, and emits the clipped polygon as
a triangle fan. Each fan triangle gets its own llvmpipe attribute
plane — coefficients that differ by ulps from the single-plane
reconstruction of the unclipped quad (probed: tools/probe_plane_6x.py,
no single plane matches the oracle at any scale >= 3).

This module reproduces that pipeline in single-rounded f32 numpy with
the convention knobs (plane order, lerp form, snapping) parameterized
so probe_plane_clip.py can search for the bit-exact combination.
"""

from __future__ import annotations

import numpy as np

f = np.float32

# Frustum planes as dot4 coefficients (clip-space x,y,z,w), Mesa
# draw_context.c order: plane k kept when dot4(pos, plane) >= 0.
PLANES = {
    "x+": (-1.0, 0.0, 0.0, 1.0),  # x <= w
    "x-": (1.0, 0.0, 0.0, 1.0),   # x >= -w
    "y+": (0.0, -1.0, 0.0, 1.0),  # y <= w
    "y-": (0.0, 1.0, 0.0, 1.0),   # y >= -w
}


def dot4(pos, plane):
    a = f(f(pos[0]) * f(plane[0]))
    b = f(f(pos[1]) * f(plane[1]))
    c = f(f(pos[2]) * f(plane[2]))
    d = f(f(pos[3]) * f(plane[3]))
    return f(f(f(a + b) + c) + d)


class Vert:
    __slots__ = ("clip", "attrs", "screen")

    def __init__(self, clip, attrs, screen=None):
        self.clip = np.asarray(clip, np.float32)
        self.attrs = np.asarray(attrs, np.float32)
        self.screen = screen  # (sx, sy) f32 or None (computed later)


def lerp_vert(base: Vert, other: Vert, t, viewport, lerp_form):
    """One clip vertex: new = base + t*(other - base) (form 'd': each op
    f32-rounded via difference) or new = base*(1-t) + other*t (form
    'w'), then the viewport transform recomputes screen pos."""
    t = f(t)

    if lerp_form == "d":
        def lin(o, i):
            return f(o + f(f(i - o) * t))
    else:  # weighted
        omt = f(f(1.0) - t)

        def lin(o, i):
            return f(f(o * omt) + f(i * t))

    clip = np.array([lin(o, i) for o, i in zip(base.clip, other.clip)], f)
    attrs = np.array([lin(o, i) for o, i in zip(base.attrs, other.attrs)], f)
    ow2, oh2 = viewport
    oow = f(f(1.0) / clip[3])
    sx = f(f(f(clip[0] * oow) * f(ow2)) + f(ow2))
    sy = f(f(f(clip[1] * oow) * f(oh2)) + f(oh2))
    return Vert(clip, attrs, (sx, sy))


def clip_tri(verts, plane_order, viewport, tconv="out", lerp_form="d"):
    """Clip one triangle; returns the polygon vertex list (possibly the
    input unchanged) or [] when fully outside.

    tconv: 'out' = Mesa's always-from-the-outside-vertex convention
    (t = dp_out/(dp_out-dp_in), new = out + t*(in-out)); 'in' = from
    the inside vertex; 'prev' = always from the edge's previous vertex.
    """
    poly = list(verts)
    for pname in plane_order:
        plane = PLANES[pname]
        dps = [dot4(v.clip, plane) for v in poly]
        if all(dp >= 0 for dp in dps):
            continue
        out = []
        n = len(poly)
        vert_prev, dp_prev = poly[0], dps[0]
        for i in range(1, n + 1):
            vert, dp = poly[i % n], dps[i % n]
            if dp_prev >= 0.0:
                out.append(vert_prev)
            if (dp < 0.0) != (dp_prev < 0.0):
                if tconv == "prev":
                    t = f(dp_prev / f(dp_prev - dp))
                    out.append(lerp_vert(vert_prev, vert, t, viewport, lerp_form))
                elif (dp < 0.0) == (tconv == "out"):
                    # base = cur (tconv=out & leaving, or tconv=in & entering)
                    t = f(dp / f(dp - dp_prev))
                    out.append(lerp_vert(vert, vert_prev, t, viewport, lerp_form))
                else:
                    t = f(dp_prev / f(dp_prev - dp))
                    out.append(lerp_vert(vert_prev, vert, t, viewport, lerp_form))
            vert_prev, dp_prev = vert, dp
        poly = out
        if len(poly) < 3:
            return []
    return poly


def fan_tris(poly):
    """Mesa emit_poly: header.v = (inlist[i-1], inlist[i], inlist[0])."""
    return [(poly[i - 1], poly[i], poly[0]) for i in range(2, len(poly))]
