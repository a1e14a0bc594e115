"""Unit tests for the .glslp preset parser (semantics of
reference src/shader/ShaderPreset.cpp parseLine :115)."""

import textwrap

from retrocapture_tpu.presets.glslp import Preset


def test_basic_multi_pass():
    p = Preset.loads(
        textwrap.dedent(
            """
            shaders = 2
            shader0 = shaders/a.glsl
            shader1 = shaders/b.glsl

            filter_linear0 = false
            filter_linear1 = "true"

            scale_type_x0 = absolute
            scale_type_y0 = source
            scale_x0 = 1280
            scale_y0 = 1.0
            frame_count_mod0 = 2
            float_framebuffer0 = true

            scale_type1 = source
            scale_x1 = 0.5
            scale_y1 = 1.0
            """
        )
    )
    assert len(p.passes) == 2
    a, b = p.passes
    assert a.shader_path.endswith("shaders/a.glsl")
    assert not a.filter_linear and b.filter_linear
    assert a.scale_type_x == "absolute" and a.scale_type_y == "source"
    assert a.scale_x == 1280 and a.scale_y == 1.0
    assert a.frame_count_mod == 2
    assert a.float_framebuffer and not a.srgb_framebuffer
    assert b.scale_type_x == b.scale_type_y == "source"
    assert b.scale_x == 0.5 and b.scale_y == 1.0


def test_textures_and_attrs():
    p = Preset.loads(
        textwrap.dedent(
            """
            shaders = 1
            shader0 = x.glsl
            textures = "SamplerLUT1;BACKGROUND"
            SamplerLUT1 = luts/l1.png
            SamplerLUT1_linear = true
            BACKGROUND = bg.png
            BACKGROUND_linear = false
            BACKGROUND_wrap_mode = repeat
            BACKGROUND_mipmap = true
            """
        )
    )
    assert set(p.textures) == {"SamplerLUT1", "BACKGROUND"}
    lut = p.textures["SamplerLUT1"]
    assert lut.path.endswith("luts/l1.png") and lut.linear
    bg = p.textures["BACKGROUND"]
    assert not bg.linear and bg.wrap_mode == "repeat" and bg.mipmap


def test_texture_names_with_digits_not_treated_as_pass_keys():
    # "SamplerLUT1" contains a digit; must not resize the pass list
    # (mirrors the early-texture-handling fix, ShaderPreset.cpp:136-173).
    p = Preset.loads(
        "shaders = 1\nshader0 = x.glsl\ntextures = SamplerLUT1\nSamplerLUT1 = l.png\n"
    )
    assert len(p.passes) == 1


def test_global_parameters():
    p = Preset.loads(
        "shaders = 1\nshader0 = x.glsl\nGAMMA = \"2.4\"\nbright_boost = 1.2\nparam2 = 3.5\n"
    )
    assert p.parameters == {"GAMMA": 2.4, "bright_boost": 1.2, "param2": 3.5}


def test_alias_and_wrap():
    p = Preset.loads(
        "shaders = 1\nshader0 = x.glsl\nalias0 = PassOut\nwrap_mode0 = mirrored_repeat\n"
        "mipmap_input0 = true\nsrgb_framebuffer0 = 1\n"
    )
    ps = p.passes[0]
    assert ps.alias == "PassOut"
    assert ps.wrap_mode == "mirrored_repeat"
    assert ps.mipmap_input and ps.srgb_framebuffer


def test_comments_and_blank_lines():
    p = Preset.loads("# comment\n\nshaders = 1\n# another\nshader0 = x.glsl\n")
    assert len(p.passes) == 1


def test_scale_without_axis_applies_both():
    p = Preset.loads("shaders = 1\nshader0 = x.glsl\nscale_type0 = viewport\nscale0 = 2.0\n")
    ps = p.passes[0]
    assert ps.scale_type_x == ps.scale_type_y == "viewport"
    assert ps.scale_x == ps.scale_y == 2.0


def test_save_as_round_trip(tmp_path):
    src = tmp_path / "t.glslp"
    src.write_text(
        "shaders = 1\nshader0 = x.glsl\n\n// params\nGAMMA = \"2.4\"\nBOOST = 1.0\n"
    )
    p = Preset.load(src)
    out = tmp_path / "out.glslp"
    p.save_as(out, {"GAMMA": 2.2, "NEWPARAM": 5.0})
    text = out.read_text()
    assert 'GAMMA = "2.2"' in text
    assert "BOOST = 1.0" in text  # untouched line preserved
    assert 'NEWPARAM = "5"' in text  # appended
    assert text.splitlines()[0] == "shaders = 1"


def test_parse_all_shipped_presets(shader_root):
    """Every shipped preset parses and every pass resolves to an existing
    shader file (489 presets; validation step 1 of SURVEY.md §7)."""
    import pathlib

    presets = sorted(shader_root.rglob("*.glslp"))
    assert len(presets) > 400
    missing = []
    for path in presets:
        p = Preset.load(path)
        assert p.passes, f"no passes parsed in {path}"
        for i, ps in enumerate(p.passes):
            if not ps.shader_path or not pathlib.Path(ps.shader_path).is_file():
                missing.append(f"{path}:{i}:{ps.shader_path}")
    assert not missing, f"{len(missing)} unresolved shader paths: {missing[:10]}"
