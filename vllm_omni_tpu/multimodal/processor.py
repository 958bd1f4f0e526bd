"""Multimodal preprocessing: images -> patch arrays, prompts -> expanded
placeholder sequences.

Parity: the HF Qwen2VLImageProcessor conventions the reference relies on
(smart_resize to patch multiples, OPENAI-CLIP normalization, temporal
patching) and the omni processor's placeholder expansion.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import numpy as np

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def smart_resize(
    height: int, width: int, factor: int = 28,
    min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280,
) -> tuple[int, int]:
    """Round (h, w) to multiples of `factor` keeping area in bounds
    (HF qwen2-vl image processor semantics)."""
    if height < factor or width < factor:
        scale = factor / min(height, width)
        height, width = math.ceil(height * scale), math.ceil(width * scale)
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return max(h_bar, factor), max(w_bar, factor)


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[H, W, C] -> [out_h, out_w, C] bilinear (PIL used when available)."""
    try:
        from PIL import Image

        pil = Image.fromarray(
            (img * 255).astype(np.uint8) if img.dtype != np.uint8 else img
        )
        resized = np.asarray(pil.resize((out_w, out_h), Image.BICUBIC))
        return resized.astype(np.float32) / 255.0
    except ImportError:
        ys = np.linspace(0, img.shape[0] - 1, out_h)
        xs = np.linspace(0, img.shape[1] - 1, out_w)
        yi = ys.astype(int)
        xi = xs.astype(int)
        return img[yi][:, xi].astype(np.float32)


def preprocess_image(
    image: Any,  # PIL.Image | np [H, W, 3] uint8/float
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """-> (patches [N, C*tp*p*p] f32, grid (t, h, w))."""
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    H, W = arr.shape[:2]
    factor = patch_size * merge_size
    h2, w2 = smart_resize(H, W, factor, min_pixels, max_pixels)
    arr = _bilinear_resize(arr, h2, w2)
    arr = (arr - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    arr = arr.transpose(2, 0, 1)  # [C, H, W]
    # temporal tiling for still images (HF repeats the frame tp times)
    frames = np.stack([arr] * temporal_patch_size)  # [tp, C, H, W]
    gt = 1
    gh, gw = h2 // patch_size, w2 // patch_size
    # [gt, tp, C, gh/m, m, p, gw/m, m, p] patch layout -> flatten per patch
    x = frames.reshape(
        gt, temporal_patch_size, 3,
        gh // merge_size, merge_size, patch_size,
        gw // merge_size, merge_size, patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = x.reshape(
        gt * gh * gw, 3 * temporal_patch_size * patch_size * patch_size
    )
    return patches.astype(np.float32), (gt, gh, gw)


def expand_placeholders(
    token_ids: Sequence[int],
    placeholder_counts: dict[int, list[int]],
) -> list[int]:
    """Expand each occurrence of a placeholder token id into N repeats,
    consuming counts in order: {token_id: [n_first, n_second, ...]}."""
    remaining = {k: list(v) for k, v in placeholder_counts.items()}
    out: list[int] = []
    for t in token_ids:
        if t in remaining and remaining[t]:
            out.extend([t] * remaining[t].pop(0))
        else:
            out.append(t)
    return out
