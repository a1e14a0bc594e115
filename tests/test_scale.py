"""Pass shape inference tests (ShaderEngine::calculateScale semantics)."""

from retrocapture_tpu.graph.scale import compute_chain_shapes
from retrocapture_tpu.presets.glslp import Preset


def _shapes(text, src=(320, 240), vp=(1920, 1080)):
    p = Preset.loads(text)
    return compute_chain_shapes(p, src[0], src[1], vp[0], vp[1])


def test_single_pass_defaults_to_viewport():
    s = _shapes("shaders = 1\nshader0 = x.glsl\n")
    assert (s[0].out_w, s[0].out_h) == (1920, 1080)


def test_explicit_source_scale():
    s = _shapes("shaders = 1\nshader0 = x.glsl\nscale_type0 = source\nscale0 = 2.0\n")
    assert (s[0].out_w, s[0].out_h) == (640, 480)


def test_source_scale_1_on_last_pass_upgrades_to_viewport():
    # ShaderEngine.cpp:881-889: "source 1.0" on the last pass fills viewport
    s = _shapes("shaders = 1\nshader0 = x.glsl\nscale_type0 = source\nscale0 = 1.0\n")
    assert (s[0].out_w, s[0].out_h) == (1920, 1080)


def test_absolute_scale():
    s = _shapes(
        "shaders = 2\nshader0 = x.glsl\nshader1 = y.glsl\n"
        "scale_type_x0 = absolute\nscale_x0 = 1280\nscale_type_y0 = source\nscale_y0 = 1.0\n"
    )
    assert (s[0].out_w, s[0].out_h) == (1280, 240)
    assert (s[0].in_w, s[0].in_h) == (320, 240)


def test_chaining():
    s = _shapes(
        "shaders = 3\nshader0 = a.glsl\nshader1 = b.glsl\nshader2 = c.glsl\n"
        "scale_type0 = source\nscale0 = 2.0\n"
        "scale_type1 = source\nscale1 = 0.5\n"
    )
    assert (s[0].out_w, s[0].out_h) == (640, 480)
    assert (s[1].in_w, s[1].in_h) == (640, 480)
    assert (s[1].out_w, s[1].out_h) == (320, 240)
    # last pass unspecified → viewport
    assert (s[2].out_w, s[2].out_h) == (1920, 1080)


def test_viewport_scale_fraction():
    s = _shapes(
        "shaders = 2\nshader0 = a.glsl\nshader1 = b.glsl\n"
        "scale_type0 = viewport\nscale0 = 0.5\n"
    )
    assert (s[0].out_w, s[0].out_h) == (960, 540)


def test_ntsc_320px_shapes():
    s = _shapes(
        "shaders = 2\nshader0 = a.glsl\nshader1 = b.glsl\n"
        "scale_type_x0 = absolute\nscale_type_y0 = source\nscale_x0 = 1280\nscale_y0 = 1.0\n"
        "float_framebuffer0 = true\n"
        "scale_type1 = source\nscale_x1 = 0.5\nscale_y1 = 1.0\n",
        src=(320, 240),
        vp=(864, 648),
    )
    assert (s[0].out_w, s[0].out_h) == (1280, 240)
    # pass 1: source 0.5 x → 640, source 1.0 y → 240 (not upgraded: explicit
    # non-1.0 x means only y stays source-1... y IS scale 1.0 explicit →
    # upgraded to viewport per the reference's per-axis check)
    assert s[1].out_w == 640
    assert s[1].out_h == 648
