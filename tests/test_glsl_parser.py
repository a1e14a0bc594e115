"""Unit + corpus tests for the GLSL parser."""

import pathlib

import pytest

from retrocapture_tpu.frontend import glsl_ast as A
from retrocapture_tpu.frontend.cpp import preprocess
from retrocapture_tpu.frontend.glsl_parser import parse, parse_expression


def test_expression_precedence():
    e = parse_expression("a + b * c")
    assert isinstance(e, A.Binary) and e.op == "+"
    assert isinstance(e.right, A.Binary) and e.right.op == "*"


def test_swizzle_chain():
    e = parse_expression("v.xyz.x")
    assert isinstance(e, A.Member) and e.name == "x"
    assert isinstance(e.obj, A.Member) and e.obj.name == "xyz"


def test_ternary_and_compare():
    e = parse_expression("x > 0.5 ? a : b")
    assert isinstance(e, A.Ternary)
    assert isinstance(e.cond, A.Binary) and e.cond.op == ">"


def test_constructor_and_call():
    e = parse_expression("vec3(1.0, 2.0, texture(s, uv).r)")
    assert isinstance(e, A.Call) and e.func == "vec3" and len(e.args) == 3


def test_assignment_ops():
    e = parse_expression("x += y * 2.0")
    assert isinstance(e, A.Assign) and e.op == "+="


def test_matrix_index():
    e = parse_expression("m[1].xyz")
    assert isinstance(e, A.Member)
    assert isinstance(e.obj, A.Index)


def test_function_def():
    tu = parse("float f(float x, inout vec2 y) { y *= 2.0; return x + 1.0; }")
    fns = tu.functions()
    assert "f" in fns
    f = fns["f"]
    assert len(f.params) == 2
    assert f.params[1].is_out


def test_globals_and_uniforms():
    tu = parse(
        "uniform sampler2D Texture;\n"
        "uniform mediump vec2 TextureSize;\n"
        "const float PI = 3.14159;\n"
        "varying vec4 TEX0;\n"
    )
    gs = tu.globals()
    assert len(gs) == 4
    assert gs[0].type.is_uniform and gs[0].type.name == "sampler2D"
    assert gs[2].type.is_const


def test_struct():
    tu = parse("struct Light { vec3 pos; float power; };")
    assert "Light" in tu.structs()


def test_for_loop():
    tu = parse(
        "void main() { float s = 0.0; for (int i = 0; i < 5; i++) { s += float(i); } }"
    )
    body = tu.functions()["main"].body.body
    assert isinstance(body[1], A.For)


def test_array_decl_and_constructor():
    tu = parse(
        "void main() { float w[3]; w[0] = 1.0; float v[2] = float[2](0.1, 0.2); }"
    )
    main = tu.functions()["main"]
    decl = main.body.body[0]
    assert isinstance(decl, A.DeclStmt)
    assert decl.declarators[0].array_size is not None


def test_if_else_chain():
    tu = parse(
        "void main() { if (x < 1.0) y = 1.0; else if (x < 2.0) y = 2.0; else y = 3.0; }"
    )
    st = tu.functions()["main"].body.body[0]
    assert isinstance(st, A.If) and isinstance(st.other, A.If)


def test_mat_times_vec():
    e = parse_expression("MVPMatrix * VertexCoord")
    assert isinstance(e, A.Binary) and e.op == "*"


def test_comma_in_for():
    tu = parse("void main() { for (x = 0.0, y = 1.0; x < y; x += 1.0) z = x; }")
    assert isinstance(tu.functions()["main"].body.body[0], A.For)


def test_parse_corpus(shader_root):
    """Parse every shader referenced by every shipped preset, both stages,
    after preprocessing. This is the grammar-coverage gate."""
    from retrocapture_tpu.presets import Preset

    seen: set[str] = set()
    failures: list[str] = []
    for preset_path in sorted(shader_root.rglob("*.glslp")):
        p = Preset.load(preset_path)
        for ps in p.passes:
            path = ps.shader_path
            if path in seen or not pathlib.Path(path).is_file():
                continue
            seen.add(path)
            src = pathlib.Path(path).read_text(encoding="utf-8", errors="replace")
            for stage in ("vertex", "fragment"):
                try:
                    text, _ = preprocess(src, stage, filename=path)
                    tu = parse(text)
                    if stage == "fragment":
                        assert "main" in tu.functions(), "no main()"
                except Exception as e:  # noqa: BLE001
                    failures.append(f"{path} [{stage}]: {type(e).__name__}: {e}")
    assert len(seen) > 400
    assert not failures, (
        f"{len(failures)}/{len(seen)} shaders failed to parse:\n"
        + "\n".join(failures[:20])
    )
