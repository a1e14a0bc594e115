"""Interpreter features exercised by the procedural corpus: typed
function-overload resolution and nested-struct default initialization
(pmalin-waterfalls / sudonhim-cloudy-voxel-world-2)."""

import os
import tempfile

import numpy as np

from retrocapture_tpu.runtime.engine import Engine


def _run_frag(body: str, decls: str = "") -> np.ndarray:
    src = f"""
#if defined(VERTEX)
attribute vec4 VertexCoord; attribute vec4 TexCoord; varying vec4 TEX0;
void main() {{ gl_Position = VertexCoord; TEX0 = TexCoord; }}
#elif defined(FRAGMENT)
uniform sampler2D Texture; varying vec4 TEX0;
{decls}
void main() {{
{body}
}}
#endif
"""
    frame = np.full((8, 8, 3), 128, np.uint8)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.glsl")
        open(p, "w").write(src)
        pp = os.path.join(td, "t.glslp")
        open(pp, "w").write(f"shaders = 1\nshader0 = {p}\n")
        e = Engine(viewport=(8, 8))
        assert e.load_preset(pp), e.last_error
        out = np.asarray(e.apply(frame))
        assert e.shader_active, e.last_error
    return out


def test_overload_resolution_by_type():
    # GLSL dispatches by parameter type, not declaration order: the
    # float overload is declared first, but pick(vec3) must hit the
    # vec3 one (pmalin-waterfalls' noise/SmoothNoise pairs).
    out = _run_frag(
        "gl_FragColor = vec4(pick(1.0) * 0.25, pick(vec3(1.0)) * 0.25, 0.0, 1.0);",
        decls="""
float pick(float x) { return 1.0; }
float pick(vec3 x) { return 2.0; }
""",
    )
    np.testing.assert_allclose(out[0, 0, 0], 0.25, atol=1 / 255.0)
    np.testing.assert_allclose(out[0, 0, 1], 0.5, atol=1 / 255.0)


def test_overload_int_float_promotion():
    # No exact match for an int literal argument: the float overload is
    # an implicit conversion; the vec2 one must not be chosen.
    out = _run_frag(
        "gl_FragColor = vec4(pick(1) * 0.25, 0.0, 0.0, 1.0);",
        decls="""
float pick(vec2 x) { return 3.0; }
float pick(float x) { return 2.0; }
""",
    )
    np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1 / 255.0)


def test_fwidth_of_concrete_folded_values():
    # Coordinate math folds to concrete numpy at trace time (plane
    # varyings); GL still evaluates fwidth per 2x2 quad on it —
    # returning 0 flattened crt-geom-famicom's OVERSAMPLE filter to a
    # degenerate scanline profile (27 dB -> 68.7 dB after the fix).
    # fwidth(8*v) on an 8x8 grid: |dv/dy| * 8 = 8/8 = 1 everywhere.
    out = _run_frag(
        """
    vec2 rs = TEX0.xy * 8.0;
    float f = fwidth(rs.y);
    float dx = dFdx(rs.x);
    gl_FragColor = vec4(f * 0.5, dx * 0.5, fwidth(1.0), 1.0);
""",
    )
    np.testing.assert_allclose(out[..., 0], 0.5, atol=1 / 255.0)
    np.testing.assert_allclose(out[..., 1], 0.5, atol=1 / 255.0)
    np.testing.assert_allclose(out[..., 2], 0.0, atol=1 / 255.0)


def test_nested_struct_default_init():
    # An uninitialized local whose struct type nests another struct:
    # member access through the nested field must see a struct value
    # (voxel-world's VoxelMarchResult.first.terrainType).
    out = _run_frag(
        """
    Outer o;
    o.first.a = 0.5;
    o.second[1].a = 0.25;
    gl_FragColor = vec4(o.first.a, o.b, o.second[1].a, 1.0);
""",
        decls="""
struct Inner { float a; };
struct Outer { Inner first; Inner second[2]; float b; };
""",
    )
    np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1 / 255.0)
    np.testing.assert_allclose(out[0, 0, 1], 0.0, atol=1 / 255.0)
    np.testing.assert_allclose(out[0, 0, 2], 0.25, atol=1 / 255.0)
