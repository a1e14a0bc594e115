"""Golden-image parity: reproduce docs/sonic-with-shaders-*.png from the
matching no-shaders screenshot and report PSNR.

BASELINE.json designates the docs/ Sonic pairs as the pixel-parity
references. The screenshots are 864x648 window grabs; the app fed the
shader a logical-resolution NEAREST-downscaled source
(FrameCapturePipeline.cpp:142-258), so we search over plausible logical
resolutions and report the best PSNR per preset.

    python tools/parity.py [--preset mattias|ntsc|all]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from retrocapture_tpu import Engine

DOCS = Path("/root/reference/docs")
SHADERS = Path("/root/reference/shaders/shaders_glsl")

PAIRS = {
    "mattias": ("sonic-no-shaders-mattias.png", "sonic-with-shaders-mattias.png",
                SHADERS / "crt/crt-mattias.glslp"),
    "ntsc": ("sonic-no-shaders-ntsc.png", "sonic-with-shaders-ntsc.png",
             SHADERS / "ntsc/ntsc-320px.glslp"),
}

# Candidate logical source resolutions (Mega Drive native is 320x224).
CANDIDATES = [(320, 224), (320, 240), (352, 240), (432, 324), (640, 448), None]


def load_rgb(path: Path) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def downscale_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    sh, sw = img.shape[:2]
    ys = (np.arange(h) + 0.5) * sh / h
    xs = (np.arange(w) + 0.5) * sw / w
    return img[ys.astype(int).clip(0, sh - 1)][:, xs.astype(int).clip(0, sw - 1)]


def run_pair(name: str, frames_hist: int = 8) -> dict:
    src_name, gold_name, preset = PAIRS[name]
    src = load_rgb(DOCS / src_name)
    gold = load_rgb(DOCS / gold_name)
    gh, gw = gold.shape[:2]
    best = {"preset": name, "psnr": -1.0, "logical": None}
    for cand in CANDIDATES:
        e = Engine(viewport=(gw, gh))
        if not e.load_preset(str(preset)):
            return {"preset": name, "error": e.last_error}
        inp = src if cand is None else downscale_nearest(src, cand[0], cand[1])
        # Temporal presets (NTSC frame_count_mod) need a few frames of
        # history; feed the same frame and keep the last output.
        out = None
        for _ in range(frames_hist if e._program.uses_history() else 2):
            out = e.apply(inp)
        out = np.asarray(out)
        p = psnr(out, gold)
        if p > best["psnr"]:
            best.update(psnr=round(p, 2), logical=cand)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="all", choices=["mattias", "ntsc", "all"])
    args = ap.parse_args()
    names = list(PAIRS) if args.preset == "all" else [args.preset]
    for n in names:
        print(run_pair(n), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
