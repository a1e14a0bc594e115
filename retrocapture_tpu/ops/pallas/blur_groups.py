"""Pallas TPU kernel: warped multi-group 5x5 NEAREST-tap blur.

The crt-mattias fragment evaluates 9 blur() calls x 25 Gaussian-weighted
NEAREST taps around per-group warped bases — 225 taps per output pixel
(crt-mattias.glsl blur(), main(); the reference's GL rasterizer absorbs
this through its texture cache, ShaderEngine.cpp:850-1475). Lowered
tap-by-tap the chain is HBM-bound and minutes to compile (round 1/2).

This kernel shares everything shareable inside one Mosaic program:

* the texture rides VMEM for the whole grid ([H, C, W] layout,
  constant-index block);
* per (tile, channel) a KB-row x 256-lane slice is dynamically ROTATED
  so the tile's whole tap window sits in lanes [0, 128) — one aligned
  window instead of per-tap band pairs (Mosaic only slices lanes at
  128 alignment; `pltpu.roll` with a dynamic shift is exact);
* per output row, taps collapse to ~22 distinct integer column offsets
  tau: one lane-gather per (channel, tau) fetches the whole KB-row
  column, and every tap's contribution becomes mask arithmetic;
* the 5x5 weights act through their rank-2 SVD factors (residual
  ~1e-4, below the RGBA8 quantization floor): per (group, rank) an
  x-weight row omega_tau (piecewise-constant in the column phase) and a
  y-weight stack psi[k] (one-hot rows over the band), so the 225-tap
  sum per channel is sum_tau G_tau * (sum_{g,m} omega * psi) — a few
  dense [KB, 128] FMAs per tau instead of per-tap gathers.

Tap indices mirror the evaluator's float32 op order exactly:
column = floor(((u + base) + offset) * W), row likewise; the per-tap
candidate split tau in {TLO, TLO+1} is re-derived per pixel from the
actual floors, so float rounding never misroutes a tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["blur5x5_groups", "blur_groups_fits", "BlurGroup"]

TX = 128  # output pixels per tile row (lane dim; take_along_axis is
# single-vreg along the gather dim, so TX cannot exceed 128)
TY = 8  # output rows per tile (TY=16 measured neutral: cost is per-row)
_KB_CAP = 32  # max band rows per channel window
_VMEM_TEX_BYTES = 6 * 2**20


class BlurGroup:
    """One blur() call: output channel, texture channel, base uv offset,
    per-tap uv offsets (5 x, 5 y), the 5x5 weight matrix (row-major
    [j][i]) and a scalar output scale (folded into the weights)."""

    __slots__ = ("channel", "bx", "by", "xo", "yo", "weights", "scale")

    def __init__(self, channel, bx, by, xo, yo, weights, scale=1.0):
        self.channel = int(channel)
        self.bx = float(bx)
        self.by = float(by)
        self.xo = tuple(float(x) for x in xo)  # uv units
        self.yo = tuple(float(y) for y in yo)
        self.weights = np.asarray(weights, np.float64)
        self.scale = float(scale)


def _rank2(weights):
    """Rank-2 SVD factors [(ax, ay), (ax2, ay2)]: out ~ sum_m ay_m ⊗ ax_m."""
    u, s, vt = np.linalg.svd(weights)
    facs = []
    for m in range(2):
        facs.append(
            (
                (np.sign(s[m]) * np.abs(s[m]) ** 0.5 * vt[m]).astype(np.float32),
                (np.abs(s[m]) ** 0.5 * u[:, m]).astype(np.float32),
            )
        )
    w2 = sum(np.outer(ay, ax) for ax, ay in facs)
    return facs, float(np.abs(weights - w2).max())


def _static_plan(groups, w, h):
    """Per-group static tap data + per-channel tau sets and row windows."""
    chans = sorted({g.channel for g in groups})
    plan = {ch: {"taus": set(), "mmin": 10**9, "mmax": -(10**9), "groups": []} for ch in chans}
    for g in groups:
        facs, resid = _rank2(g.weights * g.scale)
        xi = []  # per x-tap: (TLO, xo as f32)
        for xo in g.xo:
            c = (g.bx + xo) * w
            tlo = int(np.floor(c))
            xi.append((tlo, np.float32(xo)))
            plan[g.channel]["taus"].update((tlo, tlo + 1))
        yj = []
        for yo in g.yo:
            c = (g.by + yo) * h
            slo = int(np.floor(c))
            yj.append((slo, np.float32(yo)))
            plan[g.channel]["mmin"] = min(plan[g.channel]["mmin"], slo)
            plan[g.channel]["mmax"] = max(plan[g.channel]["mmax"], slo + 1)
        plan[g.channel]["groups"].append(
            {"g": g, "facs": facs, "xi": xi, "yj": yj}
        )
    for ch in chans:
        plan[ch]["taus"] = sorted(plan[ch]["taus"])
        plan[ch]["tmin"] = plan[ch]["taus"][0]
        plan[ch]["tmax"] = plan[ch]["taus"][-1]
        # Band rows: tap row window + descent/bend margin, 8-aligned.
        # Margin covers the TY-row tile descent (TY*h/oh*1.3, <= 8 for
        # TY=16 at upscale ratios >= 3) plus bend slack; blur_groups_fits
        # re-checks the margin against the actual geometry and rejects
        # when it is insufficient.
        win = plan[ch]["mmax"] - plan[ch]["mmin"] + 1
        plan[ch]["kb"] = min(((win + 9 + 7) // 8) * 8, _KB_CAP)
    return plan


def blur_groups_fits(tex_shape, out_shape, groups, max_dudv=None) -> bool:
    """Static feasibility: VMEM-resident texture; each channel's tap
    window (tile source span + tap spread + warp bend slack) within one
    128-lane rotated window; row window within the KB-row band; and (v2,
    when the caller supplies its warp-slope bound ``max_dudv``) the
    worst-case per-tile column drift within the tau candidate margin."""
    import os

    h, w, c = tex_shape
    oh, ow = out_shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + 2 * TX - 1) // (2 * TX)) * (2 * TX)
    if hp * wp * c * 4 > _VMEM_TEX_BYTES:
        return False
    if os.environ.get("RCTPU_BLUR", "v2") != "v1":
        if _static_plan_v2(groups, w, h, oh, ow, max_dudv) is None:
            return False
    else:
        plan = _static_plan(groups, w, h)
        # x: tile source span (with curvature slack x1.3) + tau spread
        # must fit the rotated TX-lane window
        span = TX * (w / ow) * 1.3 + 4
        descent = TY * (h / oh) * 1.3 + 3
        for ch, p in plan.items():
            if span + (p["tmax"] - p["tmin"]) > TX - 8:
                return False
            # y: tap row window + tile descent (TY rows + slack) + bend
            if (p["mmax"] - p["mmin"]) + descent > p["kb"] - 1:
                return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return platform in ("tpu", "axon")


def blur5x5_groups(tex, u, v, groups, *, interpret: bool = False, max_dudv=None):
    """tex [H, W, C] f32 (pre-transformed values), u/v [HO, WO] base warp
    → dict {channel: [HO, WO] f32 plane} with per-group scales folded.

    vmap-native: batching `tex` (u/v shared) lowers to ONE Mosaic program
    with a leading batch grid dimension instead of jax's generic
    pallas_call batching rule — measured 324 ms vs ~6 ms per batch of 16
    at 1080p (the round-2 crt-mattias bottleneck).

    Two formulations, RCTPU_BLUR=v1|v2 (default v2, chip-A/B'd):
    v1 = shared per-channel band + dense [kb, TX] one-hot/rank-2 masks;
    v2 = per-GROUP narrow row windows + exact 5x5 weights + saturating
    clip-hat tau routing (see _blur_groups_call_v2)."""
    import os

    chans = sorted({g.channel for g in groups})
    mode = os.environ.get("RCTPU_BLUR", "v2")
    if mode == "v1":
        call = _blur_groups_call
    elif mode == "v3":
        # Rejected on measurement (kept for re-probing): bf16 row-loop
        # arithmetic hoping [16, 128] bf16 vregs halve the mask/FMA op
        # count. Chip A/B 2026-08-19: v2 7.66 ms/f, v3 13.38 ms/f — the
        # narrow/widen converts around the f32 gather (Mosaic's
        # dynamic_gather requires matching value/index bitwidths, so the
        # gather can't stay bf16) cost more than the packing saves.
        def call(tex_, u_, v_, groups_, interpret_, batch):
            return _blur_groups_call_v2(
                tex_, u_, v_, groups_, interpret_, batch, bf16=True,
                max_dudv=max_dudv,
            )
    else:
        def call(tex_, u_, v_, groups_, interpret_, batch):
            return _blur_groups_call_v2(
                tex_, u_, v_, groups_, interpret_, batch, max_dudv=max_dudv
            )

    @jax.custom_batching.custom_vmap
    def run(tex_, u_, v_):
        outs = call(tex_, u_, v_, groups, interpret, batch=None)
        return tuple(outs)

    @run.def_vmap
    def _rule(axis_size, in_batched, tex_, u_, v_):  # noqa: ANN001
        tex_b, u_b, v_b = in_batched
        if tex_b and not u_b and not v_b:
            outs = call(tex_, u_, v_, groups, interpret, batch=axis_size)
            return tuple(outs), tuple(True for _ in outs)
        # Fallback: sequential map (still one program per frame).
        outs = jax.lax.map(
            lambda args: run(
                args[0] if tex_b else tex_,
                args[1] if u_b else u_,
                args[2] if v_b else v_,
            ),
            (
                tex_ if tex_b else jnp.zeros((axis_size,)),
                u_ if u_b else jnp.zeros((axis_size,)),
                v_ if v_b else jnp.zeros((axis_size,)),
            ),
        )
        return outs, tuple(True for _ in outs)

    planes = run(tex, u, v)
    return {ch: planes[i] for i, ch in enumerate(chans)}


def _blur_groups_call(tex, u, v, groups, interpret: bool, batch):
    """Build and invoke the Mosaic program. `batch=None`: tex [H, W, C] →
    planes [HO, WO]; `batch=B`: tex [B, H, W, C] → planes [B, HO, WO]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if batch is None:
        h, w, c = tex.shape
    else:
        _, h, w, c = tex.shape
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    ho, wo = u.shape
    plan = _static_plan(groups, w, h)
    chans = sorted(plan.keys())

    hp = max(((h + 7) // 8) * 8, max(plan[ch]["kb"] for ch in chans))
    wp = max(((w + 2 * TX - 1) // (2 * TX)) * (2 * TX), 2 * TX)
    if batch is None:
        tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 2, 1))  # [H, C, W]
        if hp != h or wp != w:
            tex3 = jnp.pad(tex3, ((0, hp - h), (0, 0), (0, wp - w)), mode="edge")
    else:
        tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 1, 3, 2))  # [B, H, C, W]
        if hp != h or wp != w:
            tex3 = jnp.pad(
                tex3, ((0, 0), (0, hp - h), (0, 0), (0, wp - w)), mode="edge"
            )

    wop = ((wo + TX - 1) // TX) * TX
    hop = ((ho + TY - 1) // TY) * TY
    if wop != wo or hop != ho:
        u = jnp.pad(u, ((0, hop - ho), (0, wop - wo)), mode="edge")
        v = jnp.pad(v, ((0, hop - ho), (0, wop - wo)), mode="edge")

    fw = np.float32(w)
    fh = np.float32(h)

    def kernel(u_ref, v_ref, tex_ref, *out_refs):
        ioks = {
            ch: jax.lax.broadcasted_iota(jnp.int32, (plan[ch]["kb"], TX), 0)
            for ch in chans
        }
        uu = u_ref[:].astype(jnp.float32)  # [TY, TX]
        vv = v_ref[:].astype(jnp.float32)

        # Global per-pixel column base (float op order mirrors the
        # evaluator: floor(u * W) for the un-offset base).
        c0_all = jnp.floor(uu * fw).astype(jnp.int32)  # [TY, TX]
        r0_all = jnp.floor(vv * fh).astype(jnp.int32)

        # --- per-channel rotated bands (built once per tile) ----------
        bands = {}
        for ch in chans:
            p = plan[ch]
            # Window extents over the whole tile from the extreme taps
            # (clipped floors, so texture-edge clamping is included).
            xlo = jnp.min(jnp.clip(c0_all + p["tmin"], 0, w - 1))
            ys = jnp.clip(
                jnp.min(jnp.clip(r0_all + p["mmin"], 0, h - 1)) - 1,
                0,
                hp - p["kb"],
            )
            kb = p["kb"]
            xs0 = pl.multiple_of((xlo // TX) * TX, TX)
            xs1 = pl.multiple_of(
                jnp.minimum(xs0 + TX, wp - TX), TX
            )
            b0 = tex_ref[pl.ds(ys, kb), ch, pl.ds(xs0, TX)]
            b1 = tex_ref[pl.ds(ys, kb), ch, pl.ds(xs1, TX)]
            band = pltpu.roll(
                jnp.concatenate([b0, b1], axis=1), -(xlo - xs0), 1
            )[:, :TX]
            bands[ch] = (band, xlo, ys)

        def row_body(r, _):
            uu_r = u_ref[pl.ds(r, 1), :].astype(jnp.float32)  # [1, TX]
            vv_r = v_ref[pl.ds(r, 1), :].astype(jnp.float32)
            c0 = jnp.floor(uu_r * fw).astype(jnp.int32)

            for oi, ch in enumerate(chans):
                p = plan[ch]
                band, xlo, ys = bands[ch]
                kb = p["kb"]
                iok = ioks[ch]

                # Column gathers: one per distinct tau.
                gat = {}
                for t in p["taus"]:
                    idx = jnp.clip(
                        jnp.clip(c0 + t, 0, w - 1) - xlo, 0, TX - 1
                    )
                    gat[t] = jnp.take_along_axis(
                        band, jnp.broadcast_to(idx, (kb, TX)), axis=1
                    )

                # Weight stack per tau, accumulated over (group, rank).
                ws = {t: None for t in p["taus"]}
                for ginfo in p["groups"]:
                    g = ginfo["g"]
                    ug = uu_r + np.float32(g.bx)
                    vg = vv_r + np.float32(g.by)
                    # y: one-hot band rows per y-tap, shared by ranks.
                    psis = [None, None]
                    for (slo, yoff), ay0, ay1 in zip(
                        ginfo["yj"],
                        ginfo["facs"][0][1],
                        ginfo["facs"][1][1],
                    ):
                        dr = (
                            jnp.clip(
                                jnp.floor(
                                    (vg + yoff) * fh
                                ).astype(jnp.int32),
                                0,
                                h - 1,
                            )
                            - ys
                        )
                        oh_j = (iok == dr).astype(jnp.float32)
                        psis[0] = oh_j * ay0 if psis[0] is None else psis[0] + oh_j * ay0
                        psis[1] = oh_j * ay1 if psis[1] is None else psis[1] + oh_j * ay1
                    # x: per-tap candidate split tau in {TLO, TLO+1}.
                    oms = [
                        {t: None for t in p["taus"]},
                        {t: None for t in p["taus"]},
                    ]
                    for (tlo, xoff), ax0, ax1 in zip(
                        ginfo["xi"],
                        ginfo["facs"][0][0],
                        ginfo["facs"][1][0],
                    ):
                        ti = jnp.clip(
                            jnp.floor((ug + xoff) * fw).astype(jnp.int32),
                            0,
                            w - 1,
                        )
                        a = jnp.clip(ti - c0 - tlo, 0, 1).astype(jnp.float32)
                        for m, axm in ((0, ax0), (1, ax1)):
                            lo = axm * (1.0 - a)
                            hi = axm * a
                            oms[m][tlo] = lo if oms[m][tlo] is None else oms[m][tlo] + lo
                            oms[m][tlo + 1] = (
                                hi if oms[m][tlo + 1] is None else oms[m][tlo + 1] + hi
                            )
                    for m in (0, 1):
                        for t, om in oms[m].items():
                            if om is None:
                                continue
                            term = psis[m] * om
                            ws[t] = term if ws[t] is None else ws[t] + term

                acc = None
                for t in p["taus"]:
                    if ws[t] is None:
                        continue
                    term = gat[t] * ws[t]
                    acc = term if acc is None else acc + term
                out_refs[oi][pl.ds(r, 1), :] = jnp.sum(
                    acc, axis=0, keepdims=True
                )
            return 0

        jax.lax.fori_loop(0, TY, row_body, 0)

    if batch is None:
        grid = (hop // TY, wop // TX)
        uv_spec = pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        tex_spec = pl.BlockSpec(
            (hp, c, wp), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((hop, wop), jnp.float32) for _ in chans]
    else:
        # Batch rides the OUTERMOST grid dim: the (hp, c, wp) texture
        # block re-DMAs only when b changes; u/v tiles are shared.
        grid = (batch, hop // TY, wop // TX)
        uv_spec = pl.BlockSpec(
            (TY, TX), lambda b, i, j: (i, j), memory_space=pltpu.VMEM
        )
        tex_spec = pl.BlockSpec(
            (None, hp, c, wp), lambda b, i, j: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (None, TY, TX), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
        )
        out_shape = [
            jax.ShapeDtypeStruct((batch, hop, wop), jnp.float32) for _ in chans
        ]
    planes = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[uv_spec, uv_spec, tex_spec],
        out_specs=[out_spec for _ in chans],
        interpret=interpret,
    )(u, v, tex3)
    if wop != wo or hop != ho:
        planes = [pl_[..., :ho, :wo] for pl_ in planes]
    return list(planes)


# ---------------------------------------------------------------------------
# v2: per-group narrow row windows + exact 5x5 weights
#
# The v1 kernel pays dense [kb=24, TX] mask arithmetic (rank-2 psi/ws
# accumulation) and 22 taus x kb lane-gather instructions PER OUTPUT ROW
# per channel. v2 restructures around three observations, chip-profiled
# on crt-mattias (the only registered user):
#
#   1. Each blur group's y-taps span only 3-8 source rows (+ tile
#      descent + bend) — a per-GROUP [R_g, TX] window (R_g = 8..16) read
#      straight from the VMEM-resident texture with a dynamic row base
#      replaces the shared kb=24 band, shrinking every downstream vector
#      op 1.5-3x.
#   2. The per-row tap columns drift at most +-1 texel across a TY=8
#      row tile (crt-mattias has no per-row x jitter in the blur coords;
#      only the curvature bend moves u with y). Gathers therefore run
#      ONCE PER TILE against row 0's column base, and each x-tap routes
#      to tau candidates {tlo-1..tlo+2} with SATURATING clip-hats: the
#      hats are exact 0/1 indicators of integer rel = ti - c0_ref - tlo,
#      and at texture edges the saturated candidate's clamped gather
#      column coincides with the clamped tap column (same argument as
#      v1's 2-candidate split), so routing stays bit-exact per tap.
#   3. The weight routing (hats, om accumulation) is identical across
#      the tile's 8 output rows — computed ONCE on [TY, TX] vregs and
#      sliced per row, where v1 recomputed [1, TX] work per row (a
#      [1, TX] op costs a full vreg slot).
#
# v2 also applies the EXACT 5x5 weights per (y-tap j, tau) instead of
# v1's rank-2 SVD factorization (residual ~1e-4) — strictly closer to
# the evaluator. Selected by RCTPU_BLUR (default v2).


def _static_plan_v2(groups, w, h, oh, ow, max_dudv=None):
    """Per-group static plan: tap bases, tau sets (+-1/+2 routing
    margin), and the narrow row-window height R. Returns None when any
    group's geometry cannot satisfy the window invariants (caller falls
    back / rejects via blur_groups_fits).

    ``max_dudv``: worst-case |du/dv| of the warp (uv units per v unit),
    supplied by the caller from its analytic warp bound (for crt-mattias:
    the CURVATURE=1 curve slope — the runtime CURVATURE parameter only
    interpolates toward that curve, so it is the hard ceiling). v2's tau
    routing gathers against row 0's column base and covers per-row drift
    only via the {-1..+2} candidate window; the plan REJECTS (returns
    None) when the worst-case per-tile column drift could exceed that
    margin, instead of silently routing to the wrong texel. ``None``
    means the caller vouches for drift <= +-1 texel per TY-row tile."""
    descent = int(np.ceil(TY * (h / oh) * 1.3)) + 1
    span = TX * (w / ow) * 1.3 + 4
    if max_dudv is not None:
        # Column drift across a TY-row output tile, in source texels.
        # Candidates {-1..+2} around base rel in {0, 1} tolerate 1.0
        # texel of drift each way; keep 0.25 texel of floor-rounding
        # fuzz.
        drift_texels = float(max_dudv) * (TY - 1) / float(oh) * float(w)
        if drift_texels > 0.75:
            return None
    plan = []
    for g in groups:
        w32 = (g.weights * g.scale).astype(np.float32)
        xi = []
        for xo in g.xo:
            c = (np.float32(g.bx) + np.float32(xo)) * np.float32(w)
            xi.append((int(np.floor(c)), np.float32(xo)))
        yj = []
        for yo in g.yo:
            c = (np.float32(g.by) + np.float32(yo)) * np.float32(h)
            yj.append((int(np.floor(c)), np.float32(yo)))
        taus = sorted({t + k for t, _ in xi for k in (-1, 0, 1, 2)})
        slos = [s for s, _ in yj]
        win = (max(slos) + 1) - min(slos) + 1
        r_g = ((win + descent + 3 + 7) // 8) * 8
        if r_g > _KB_CAP:
            return None
        # Rotated-window coverage: tile source span + routed tau spread.
        if span + (taus[-1] - taus[0]) > TX - 8:
            return None
        plan.append(
            {
                "g": g,
                "w32": w32,
                "xi": xi,
                "yj": yj,
                "taus": taus,
                "tmin": taus[0],
                "R": r_g,
                "slo_min": min(slos),
            }
        )
    return plan


def _blur_groups_call_v2(
    tex, u, v, groups, interpret: bool, batch, bf16=False, max_dudv=None
):
    """v2 Mosaic program (see module comment). Same interface as
    _blur_groups_call. bf16=True (v3) runs the window, gathers, and the
    row-loop mask/FMA arithmetic in bfloat16 — (16, 128) bf16 tiles pack
    two sublane rows per vreg, halving the dominant vector-op count."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if batch is None:
        h, w, c = tex.shape
    else:
        _, h, w, c = tex.shape
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    ho, wo = u.shape
    plan = _static_plan_v2(groups, w, h, ho, wo, max_dudv)
    if plan is None:
        # ValueError (not assert): interpret-mode callers skip the
        # blur_groups_fits gate, and the engine's degrade-to-passthrough
        # net catches ValueError — an AssertionError would crash instead
        # of falling back to the evaluator (r3 advisor finding).
        raise ValueError("blur_groups v2: geometry infeasible (see _static_plan_v2)")
    chans = sorted({g.channel for g in groups})

    max_r = max(p["R"] for p in plan)
    hp = max(((h + 7) // 8) * 8, max_r)
    wp = max(((w + 2 * TX - 1) // (2 * TX)) * (2 * TX), 2 * TX)
    if batch is None:
        tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 2, 1))  # [H, C, W]
        if hp != h or wp != w:
            tex3 = jnp.pad(tex3, ((0, hp - h), (0, 0), (0, wp - w)), mode="edge")
    else:
        tex3 = jnp.transpose(tex.astype(jnp.float32), (0, 1, 3, 2))
        if hp != h or wp != w:
            tex3 = jnp.pad(
                tex3, ((0, 0), (0, hp - h), (0, 0), (0, wp - w)), mode="edge"
            )

    wop = ((wo + TX - 1) // TX) * TX
    hop = ((ho + TY - 1) // TY) * TY
    if wop != wo or hop != ho:
        u = jnp.pad(u, ((0, hop - ho), (0, wop - wo)), mode="edge")
        v = jnp.pad(v, ((0, hop - ho), (0, wop - wo)), mode="edge")

    fw = np.float32(w)
    fh = np.float32(h)

    acc_t = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(u_ref, v_ref, tex_ref, *out_refs):
        uu = u_ref[:].astype(jnp.float32)  # [TY, TX]
        vv = v_ref[:].astype(jnp.float32)
        c0_all = jnp.floor(uu * fw).astype(jnp.int32)  # [TY, TX]
        c0_ref = c0_all[0:1, :]  # row-0 column base, shared per tile

        # ---- per-(channel, group) tile precompute --------------------
        pre = []  # (channel, taps W_t dict, om[j][t] [TY,TX], rel_j)
        for p in plan:
            g = p["g"]
            ch = g.channel
            r_g = p["R"]
            ug = uu + np.float32(g.bx)
            vg = vv + np.float32(g.by)

            # y: per-tap rows + scalar window base (1-row fuzz margin).
            drs = [
                jnp.clip(
                    jnp.floor((vg + yoff) * fh).astype(jnp.int32), 0, h - 1
                )
                for _, yoff in p["yj"]
            ]
            # Window base: min over ALL taps' rows (not drs[0] — yo is
            # not guaranteed ascending, and anchoring to a non-minimal
            # tap would push lower taps to negative rel and silently
            # drop them from the one-hot row select; r3 advisor finding).
            m0 = functools.reduce(jnp.minimum, [jnp.min(d) for d in drs])
            m0 = jnp.clip(m0 - 1, 0, hp - r_g)
            rels = [dr - m0 for dr in drs]  # [TY, TX] ints in [0, R)

            # x: rotated [R, TX] window straight from the texture.
            xlo = jnp.min(jnp.clip(c0_all + p["tmin"], 0, w - 1))
            xs0 = pl.multiple_of((xlo // TX) * TX, TX)
            xs1 = pl.multiple_of(jnp.minimum(xs0 + TX, wp - TX), TX)
            b0 = tex_ref[pl.ds(m0, r_g), ch, pl.ds(xs0, TX)]
            b1 = tex_ref[pl.ds(m0, r_g), ch, pl.ds(xs1, TX)]
            win = pltpu.roll(jnp.concatenate([b0, b1], axis=1), -(xlo - xs0), 1)[
                :, :TX
            ]

            # One lane-gather per tau, shared by the whole tile. Mosaic's
            # tpu.dynamic_gather requires matching value/index bitwidths,
            # so the gather itself stays f32 even in bf16 mode; taps are
            # narrowed after.
            taps = {}
            for t in p["taus"]:
                idx = jnp.clip(jnp.clip(c0_ref + t, 0, w - 1) - xlo, 0, TX - 1)
                taps[t] = jnp.take_along_axis(
                    win, jnp.broadcast_to(idx, (r_g, TX)), axis=1
                )
            if bf16:
                taps = {t: x.astype(jnp.bfloat16) for t, x in taps.items()}

            # Saturating clip-hat routing of each x-tap to 4 tau
            # candidates, exact-indicator for integer rel (see header).
            hats = []  # per i: {k: [TY, TX]}
            for tlo, xoff in p["xi"]:
                ti = jnp.clip(
                    jnp.floor((ug + xoff) * fw).astype(jnp.int32), 0, w - 1
                )
                rel = (ti - c0_ref - tlo).astype(jnp.float32)
                # h_k = [rel == k], saturating at both ends (rel < -1
                # routes to k=-1, rel > 2 to k=2 — edge-clamp exactness
                # per the module comment).
                t1 = jnp.clip(rel + 1.0, 0.0, 1.0)
                t2 = jnp.clip(rel, 0.0, 1.0)
                t3 = jnp.clip(rel - 1.0, 0.0, 1.0)
                hats.append({-1: 1.0 - t1, 0: t1 - t2, 1: t2 - t3, 2: t3})

            # om[j][tau]: exact-weight x-row per y-tap, [TY, TX].
            oms = []
            for j in range(len(p["yj"])):
                om = {}
                for i, (tlo, _) in enumerate(p["xi"]):
                    wji = p["w32"][j][i]
                    for k, hat in hats[i].items():
                        t = tlo + k
                        term = hat * wji
                        om[t] = term if t not in om else om[t] + term
                if bf16:
                    om = {t: x.astype(jnp.bfloat16) for t, x in om.items()}
                oms.append(om)
            pre.append((ch, r_g, taps, oms, rels))

        # ---- per-row contraction (rows statically unrolled) ----------
        for r in range(TY):
            accs = {ch: None for ch in chans}
            for ch, r_g, taps, oms, rels in pre:
                iok = jax.lax.broadcasted_iota(jnp.int32, (r_g, TX), 0)
                ohs = [
                    (iok == rel[r : r + 1, :]).astype(acc_t)
                    for rel in rels
                ]
                for t, wt in taps.items():
                    m_t = None
                    for j, om in enumerate(oms):
                        if t not in om:
                            continue
                        term = ohs[j] * om[t][r : r + 1, :]
                        m_t = term if m_t is None else m_t + term
                    if m_t is None:
                        continue
                    # bf16: the [r_g, TX] product and row-reduce stay
                    # packed; only the [1, TX] result widens. Most band
                    # rows are exact bf16 zeros (one-hot misses), so the
                    # reduce error is a few ulps of the 2-3 live terms.
                    val = jnp.sum(wt * m_t, axis=0, keepdims=True).astype(
                        jnp.float32
                    )
                    accs[ch] = val if accs[ch] is None else accs[ch] + val
            for oi, ch in enumerate(chans):
                out_refs[oi][r : r + 1, :] = accs[ch]

    if batch is None:
        grid = (hop // TY, wop // TX)
        uv_spec = pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        tex_spec = pl.BlockSpec(
            (hp, c, wp), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((hop, wop), jnp.float32) for _ in chans]
    else:
        grid = (batch, hop // TY, wop // TX)
        uv_spec = pl.BlockSpec(
            (TY, TX), lambda b, i, j: (i, j), memory_space=pltpu.VMEM
        )
        tex_spec = pl.BlockSpec(
            (None, hp, c, wp), lambda b, i, j: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (None, TY, TX), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
        )
        out_shape = [
            jax.ShapeDtypeStruct((batch, hop, wop), jnp.float32) for _ in chans
        ]
    planes = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[uv_spec, uv_spec, tex_spec],
        out_specs=[out_spec for _ in chans],
        interpret=interpret,
    )(u, v, tex3)
    if wop != wo or hop != ho:
        planes = [pl_[..., :ho, :wo] for pl_ in planes]
    return list(planes)
