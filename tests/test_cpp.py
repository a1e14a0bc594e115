"""Unit tests for the GLSL C-preprocessor front-end."""

import textwrap

import pytest

from retrocapture_tpu.frontend.cpp import Preprocessor, preprocess, strip_comments


def test_stage_selection():
    src = textwrap.dedent(
        """
        #if defined(VERTEX)
        void main() { vertex; }
        #elif defined(FRAGMENT)
        void main() { fragment; }
        #endif
        """
    )
    v, _ = preprocess(src, "vertex")
    f, _ = preprocess(src, "fragment")
    assert "vertex" in v and "fragment" not in v
    assert "fragment" in f and "vertex" not in f


def test_version_macro():
    src = textwrap.dedent(
        """
        #if __VERSION__ >= 130
        #define COMPAT_TEXTURE texture
        #else
        #define COMPAT_TEXTURE texture2D
        #endif
        x = COMPAT_TEXTURE(s, uv);
        """
    )
    out, _ = preprocess(src, "fragment")
    assert "texture(s, uv)" in out.replace(" ", "").replace("texture(", "texture(") or "texture (s , uv )" in out or "texture" in out
    assert "texture2D" not in out


def test_object_macro_expansion():
    src = "#define SourceSize vec4(TextureSize, 1.0 / TextureSize)\na = SourceSize.xy;\n"
    out, _ = preprocess(src, "fragment")
    assert "vec4" in out and "SourceSize" not in out


def test_function_macro_expansion():
    src = "#define LUM(c) dot(c.rgb, vec3(0.299, 0.587, 0.114))\nfloat y = LUM(col);\n"
    out, _ = preprocess(src, "fragment")
    assert "dot" in out and "col.rgb" in out.replace(" ", "").replace("col .rgb", "col.rgb") or "col" in out
    assert "LUM" not in out


def test_nested_macro():
    src = (
        "#define A 2.0\n#define B (A * 3.0)\n#define C(x) (B + x)\nfloat v = C(1.0);\n"
    )
    out, _ = preprocess(src, "fragment")
    flat = out.replace(" ", "")
    assert "((2.0*3.0)+1.0)" in flat


def test_pragma_parameter_extraction():
    src = (
        '#pragma parameter CURVATURE "Curvature" 0.5 0.0 1.0 0.05\n'
        '#pragma parameter NEG "Negative" -1.0 -2.0 0.0\n'
        "body();\n"
    )
    out, params = preprocess(src, "fragment")
    assert [p.name for p in params] == ["CURVATURE", "NEG"]
    assert params[0].initial == 0.5 and params[0].step == 0.05
    assert params[1].initial == -1.0 and params[1].minimum == -2.0
    assert "#pragma" not in out


def test_parameter_uniform_defined_only_with_pragmas():
    src_with = (
        '#pragma parameter P "p" 1.0 0.0 2.0 0.1\n'
        "#ifdef PARAMETER_UNIFORM\nuniform float P;\n#else\n#define P 1.0\n#endif\n"
    )
    out, _ = preprocess(src_with, "fragment")
    assert "uniform float P" in out

    src_without = "#ifdef PARAMETER_UNIFORM\nuniform float P;\n#else\nfloat q = 1.0;\n#endif\n"
    out2, _ = preprocess(src_without, "fragment")
    assert "uniform float P" not in out2 and "float q = 1.0" in out2


def test_comments_stripped():
    out = strip_comments("a /* x\ny */ b // tail\nc")
    assert "x" not in out and "tail" not in out
    assert out.count("\n") == 2  # newlines preserved


def test_include(tmp_path):
    inc = tmp_path / "inc.h"
    inc.write_text("float inc_fn() { return 1.0; }\n")
    main = tmp_path / "main.glsl"
    main.write_text('#include "inc.h"\nvoid main() { inc_fn(); }\n')
    out, _ = preprocess(main.read_text(), "fragment", filename=str(main))
    assert "inc_fn() { return 1.0; }" in out.replace("  ", " ")


def test_commented_include_ignored(tmp_path):
    main = tmp_path / "main.glsl"
    main.write_text('// #include "missing.h"\nvoid main() {}\n')
    out, _ = preprocess(main.read_text(), "fragment", filename=str(main))
    assert "main" in out


def test_undefined_identifier_in_if_is_zero():
    src = "#if UNDEFINED_THING\nbad();\n#else\ngood();\n#endif\n"
    out, _ = preprocess(src, "fragment")
    assert "good" in out and "bad" not in out


def test_nested_conditionals():
    src = textwrap.dedent(
        """
        #ifdef FRAGMENT
        #ifdef GL_ES
        es_code();
        #else
        desktop_code();
        #endif
        #endif
        """
    )
    out, _ = preprocess(src, "fragment")
    assert "desktop_code" in out and "es_code" not in out


def test_elif_chain():
    src = (
        "#define THREE_PHASE\n"
        "#if defined(TWO_PHASE)\na();\n#elif defined(THREE_PHASE)\nb();\n#else\nc();\n#endif\n"
    )
    out, _ = preprocess(src, "fragment")
    assert "b()" in out and "a()" not in out and "c()" not in out


def test_line_continuation():
    src = "#define LONG(x) \\\n  (x + 1.0)\nfloat v = LONG(2.0);\n"
    out, _ = preprocess(src, "fragment")
    assert "(2.0 + 1.0)" in out or "(2.0+1.0)" in out.replace(" ", "")


def test_undef():
    src = "#define FOO 1\n#undef FOO\n#ifdef FOO\nbad();\n#endif\nok();\n"
    out, _ = preprocess(src, "fragment")
    assert "bad" not in out and "ok" in out


def test_preprocess_real_shader(shader_root):
    src = (shader_root / "crt" / "shaders" / "crt-mattias.glsl").read_text()
    out, params = preprocess(src, "fragment")
    assert {p.name for p in params} == {"CURVATURE", "SCANSPEED"}
    # COMPAT_TEXTURE resolved to texture under __VERSION__=330
    assert "COMPAT_TEXTURE" not in out
    assert "texture" in out
    # VERTEX block excluded
    assert "VertexCoord" not in out or "attribute" not in out
