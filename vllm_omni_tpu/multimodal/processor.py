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


def preprocess_video(
    frames: Any,  # [T, H, W, 3] array | sequence of PIL/np frames
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 128 * 28 * 28,
    max_pixels: int = 768 * 28 * 28,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """Frames -> (patches [N, C*tp*p*p] f32, grid (t, h, w)).

    HF Qwen2VLImageProcessor._preprocess video semantics (the path the
    reference reaches through vLLM's multimodal registry,
    reference chat_utils.py:42-60): every frame smart_resized to the
    first frame's target (h, w), CLIP-normalized, the frame axis padded
    to a multiple of `temporal_patch_size` by repeating the last frame,
    then patched [gt, tp, C, gh/m, m, p, gw/m, m, p] exactly like still
    images (which tile one frame tp times instead)."""
    frame_list = [np.asarray(f) for f in frames]
    if not frame_list:
        raise ValueError("empty video")
    proc = []
    H, W = frame_list[0].shape[:2]
    factor = patch_size * merge_size
    h2, w2 = smart_resize(H, W, factor, min_pixels, max_pixels)
    for arr in frame_list:
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        arr = _bilinear_resize(arr, h2, w2)
        arr = (arr - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
        proc.append(arr.transpose(2, 0, 1))  # [C, H, W]
    stack = np.stack(proc)  # [T, C, H, W]
    T = stack.shape[0]
    if T % temporal_patch_size:
        pad = temporal_patch_size - (T % temporal_patch_size)
        stack = np.concatenate([stack, np.repeat(stack[-1:], pad, axis=0)])
    gt = stack.shape[0] // temporal_patch_size
    gh, gw = h2 // patch_size, w2 // patch_size
    x = stack.reshape(
        gt, temporal_patch_size, 3,
        gh // merge_size, merge_size, patch_size,
        gw // merge_size, merge_size, patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = x.reshape(
        gt * gh * gw, 3 * temporal_patch_size * patch_size * patch_size
    )
    return patches.astype(np.float32), (gt, gh, gw)


def sample_video_frames(
    num_frames_total: int,
    video_fps: float,
    fps: float = 2.0,
    min_frames: int = 4,
    max_frames: int = 768,
    temporal_patch_size: int = 2,
) -> np.ndarray:
    """Frame indices to sample from a clip (qwen-vl-utils `smart_nframes`
    semantics: target `fps` frames/sec clamped to [min, max] and rounded
    to a multiple of temporal_patch_size)."""
    if num_frames_total <= 0:
        raise ValueError("empty video")
    dur = num_frames_total / max(video_fps, 1e-6)
    n = dur * fps
    n = min(max(n, min_frames), max_frames, num_frames_total)
    n = max(int(n // temporal_patch_size) * temporal_patch_size,
            temporal_patch_size)
    idx = np.linspace(0, num_frames_total - 1, n)
    return np.round(idx).astype(np.int64)


def decode_video_bytes(
    data: bytes, fps: float = 2.0, max_frames: int = 768,
) -> tuple[np.ndarray, float]:
    """Decode an encoded video (mp4/webm bytes) into sampled RGB frames
    using OpenCV. -> (frames [T, H, W, 3] uint8, second_per_grid).

    The reference downloads video URLs to temp files and decodes them
    via vLLM's fetch_video (reference chat_utils.py:42-127); cv2 is the
    decoder available in this environment."""
    import tempfile

    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "video decoding requires OpenCV (cv2), which is unavailable"
        ) from e
    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        f.write(data)
        f.flush()
        cap = cv2.VideoCapture(f.name)
        if not cap.isOpened():
            raise ValueError("could not decode video stream")
        video_fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        frames = []
        if total > 0:
            want = sample_video_frames(total, video_fps, fps=fps,
                                       max_frames=max_frames)
            want_set = set(int(i) for i in want)
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if i in want_set:
                    frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                i += 1
        else:  # stream without frame count: read all, sample after
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if frames:
                want = sample_video_frames(len(frames), video_fps, fps=fps,
                                           max_frames=max_frames)
                frames = [frames[int(i)] for i in want]
        cap.release()
    if not frames:
        raise ValueError("video contained no frames")
    n_sampled = len(frames)
    sampled_fps = n_sampled / max(total or n_sampled, 1) * video_fps
    second_per_grid = 2.0 / max(sampled_fps, 1e-6)  # temporal_patch_size=2
    return np.stack(frames), float(second_per_grid)


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


def get_chunked_index(
    values: np.ndarray, per_chunk: int,
) -> list[tuple[int, int]]:
    """(start, end) slices of a monotonically increasing value list where
    values fall in successive [k*per_chunk, (k+1)*per_chunk) ranges (HF
    Qwen2_5OmniProcessor.get_chunked_index semantics)."""
    spans: list[tuple[int, int]] = []
    i, start, chunk = 0, 0, 1
    while i < len(values):
        if values[i] >= chunk * per_chunk:
            spans.append((start, i))
            start = i
            chunk += 1
        i += 1
    spans.append((start, len(values)))
    return spans


def build_video_audio_interleave(
    video_grid: tuple[int, int, int],
    audio_len: int,
    video_token_id: int,
    audio_token_id: int,
    second_per_grid: float = 1.0,
    merge_size: int = 2,
    position_id_per_seconds: int = 25,
    seconds_per_chunk: float = 2.0,
) -> list[int]:
    """Token layout for one use_audio_in_video clip: video and audio
    placeholder runs interleaved by time chunks (HF Qwen2_5OmniProcessor
    use_audio_in_video expansion; reference reaches it via the HF
    processor). Excludes the surrounding bos/eos specials."""
    gt, gh, gw = video_grid
    h, w = gh // merge_size, gw // merge_size
    vid_t = np.broadcast_to(
        np.arange(gt).reshape(-1, 1, 1), (gt, h, w)).reshape(-1)
    vid_t = vid_t * float(second_per_grid) * position_id_per_seconds
    aud_t = np.arange(audio_len)
    per_chunk = int(position_id_per_seconds * seconds_per_chunk)
    v_spans = get_chunked_index(vid_t, per_chunk)
    a_spans = get_chunked_index(aud_t, per_chunk)
    out: list[int] = []
    for j in range(max(len(v_spans), len(a_spans))):
        if j < len(v_spans):
            out.extend([video_token_id] * (v_spans[j][1] - v_spans[j][0]))
        if j < len(a_spans):
            out.extend([audio_token_id] * (a_spans[j][1] - a_spans[j][0]))
    return out
