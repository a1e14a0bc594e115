"""Driver-exact GL semantics the round-2 parity work depends on.

Golden values in this file were probed from the real GL oracle (Mesa
llvmpipe, RGBA32F readback) on 2026-08-17; the tests pin the engine's
reproductions so regressions can't silently reopen the knife-edge
classes (see PARITY.md).
"""

import numpy as np
import pytest

from retrocapture_tpu.frontend.builtins import _lp_trig
from retrocapture_tpu.ops.sampling import _ifloor32
from retrocapture_tpu.runtime.engine import _plane_setup_f32, _plane_component


def test_lp_sin_golden():
    # Probed llvmpipe values: sin at exact f32 inputs.
    xs = np.array([0.09137192368507385, 0.1226142942905426, 0.7906723022460938],
                  np.float32)
    want = np.array([0.09124483913183212, 0.12230729311704636, 0.7108263373374939],
                    np.float32)
    got = _lp_trig(np, xs, False)
    assert np.array_equal(got, want), (got, want)


def test_lp_sin_matches_reference_poly_small():
    # Accuracy sanity over the principal range: < 4e-8 absolute.
    x = np.linspace(0, np.pi, 5001).astype(np.float32)
    err = np.abs(_lp_trig(np, x, False).astype(np.float64) - np.sin(x.astype(np.float64)))
    assert err.max() < 1.2e-7, err.max()
    errc = np.abs(_lp_trig(np, x, True).astype(np.float64) - np.cos(x.astype(np.float64)))
    assert errc.max() < 1.2e-7, errc.max()


def test_lp_trig_traced_path_close():
    import jax.numpy as jnp

    x = np.linspace(0, 3.15, 1024).astype(np.float32)
    a = _lp_trig(np, x, False)
    b = np.asarray(_lp_trig(jnp, jnp.asarray(x), False))
    # Traced path has no f64 FMA: 1-ulp tail allowed.
    ulp = np.abs(a.astype(np.float64) - b.astype(np.float64)) / np.spacing(
        np.maximum(np.abs(a), 1e-6).astype(np.float32)
    ).astype(np.float64)
    assert (ulp <= 1.0 + 1e-6).all(), ulp.max()


def test_plane_setup_identity_viewport():
    # 640x480 fullscreen quad (a0 folds the half-pixel center). Golden
    # first-pixel values probed from llvmpipe: u(px 0) = 0.0007812381
    # (NOT 0.5/640 = 0.00078125 — the driver plane setup's rounding),
    # v(px 0) = 0.0010416667 = f32(0.5/480) exactly.
    a0, dadx, dady = _plane_setup_f32(640, 480, np.float32(1.0), np.float32(1.0), np.float32(0.0))
    assert dadx == np.float32(1.0 / 640.0)
    assert dady == np.float32(0.0)
    assert a0 == np.float32(0.0007812381)
    assert a0 != np.float32(0.5 / 640.0)
    b0, bdx, bdy = _plane_setup_f32(640, 480, np.float32(0.0), np.float32(1.0), np.float32(1.0))
    assert bdx == np.float32(0.0)
    assert bdy == np.float32(1.0 / 480.0)
    assert b0 == np.float32(0.5 / 480.0)


def test_plane_component_axis_pure_is_broadcast_view():
    comp = _plane_component(np.float32(0.5), np.float32(0.25), 0.0, 8, 4)
    assert isinstance(comp, np.ndarray) and comp.shape == (4, 8)
    assert (comp == comp[:1]).all()  # row-pure


def test_ifloor32_nonfinite_is_int_min():
    import jax

    vals = np.array([np.inf, -np.inf, np.nan, 2.75, -2.75], np.float32)
    got = np.asarray(jax.jit(_ifloor32)(vals))
    assert got[0] == got[1] == got[2] == np.int32(-2147483648)
    assert got[3] == 2 and got[4] == -3


@pytest.fixture()
def tiny_engine(tmp_path):
    from retrocapture_tpu import Engine

    def make(frag_body: str, float_fb: bool = True):
        glsl = tmp_path / "t.glsl"
        glsl.write_text(
            "#if defined(VERTEX)\n"
            "attribute vec4 VertexCoord;\nattribute vec4 TexCoord;\n"
            "varying vec4 TEX0;\nuniform mat4 MVPMatrix;\n"
            "void main() { gl_Position = MVPMatrix * VertexCoord; TEX0 = TexCoord; }\n"
            "#elif defined(FRAGMENT)\n"
            "varying vec4 TEX0;\nuniform sampler2D Texture;\n"
            "void main() {\n" + frag_body + "\n}\n#endif\n"
        )
        p = tmp_path / "t.glslp"
        p.write_text(
            "shaders = 1\nshader0 = t.glsl\nfilter_linear0 = false\n"
            + ("float_framebuffer0 = true\n" if float_fb else "")
        )
        e = Engine(viewport=(8, 8))
        assert e.load_preset(str(p))
        return e

    return make


def test_oob_array_read_is_zero(tiny_engine):
    e = tiny_engine(
        "  float a[4];\n"
        "  for (int i=0; i<4; i++) a[i] = 0.25 * float(i+1);\n"
        "  float neg = 0.0; float big = 0.0;\n"
        "  for (int j=0; j<1; j++) { neg = a[j-2]; big = a[j+9]; }\n"
        "  gl_FragColor = vec4(neg + 0.5, big + 0.25, a[3], 1.0);"
    )
    out = np.asarray(e.apply(np.zeros((8, 8, 3), np.uint8)))
    assert np.allclose(out[4, 4], [0.5, 0.25, 1.0], atol=1e-6), out[4, 4]


def test_pow_lowering_matches_nir(tiny_engine):
    # Only exponents 1/2/4 are mul-lowered; 3.0 goes through
    # exp2(y*log2(x)) and is NaN for negative bases (flushed by the
    # float framebuffer read as NaN -> engine keeps NaN -> final u8/clip
    # path would zero it; with float fb we observe the raw values).
    e = tiny_engine(
        "  float v = texture2D(Texture, TEX0.xy).r - 0.75;\n"  # -0.5
        "  float a = pow(v, 2.0);\n"
        "  float b = pow(v, 4.0) + 0.25;\n"
        "  float c = max(pow(v, 3.0), 0.0) + 0.125;\n"  # max(NaN,0)=0
        "  gl_FragColor = vec4(a, b, c, 1.0);"
    )
    frame = np.full((8, 8, 3), 64, np.uint8)  # 0.2509804 -> v=-0.4990196
    out = np.asarray(e.apply(frame))
    v = np.float32(64 / 255) - np.float32(0.75)
    assert abs(out[4, 4, 0] - v * v) < 1e-6
    assert abs(out[4, 4, 1] - (v * v * (v * v) + np.float32(0.25))) < 1e-6
    assert abs(out[4, 4, 2] - 0.125) < 1e-6  # NaN sanitized by max


def test_min_max_nan_select_semantics():
    import jax.numpy as jnp

    from retrocapture_tpu.frontend.builtins import _gl_max, _gl_min

    nan = np.float32(np.nan)
    assert _gl_max(np, nan, np.float32(0.0)) == 0.0
    assert np.isnan(_gl_max(np, np.float32(0.0), nan))
    assert _gl_min(np, nan, np.float32(1.0)) == 1.0
    assert np.isnan(_gl_min(np, np.float32(1.0), nan))
