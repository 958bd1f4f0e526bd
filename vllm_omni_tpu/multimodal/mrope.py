"""Multimodal rotary position computation (M-RoPE) for omni sequences.

Behavioral parity with the reference's omni MRotaryEmbedding position
builder (reference model_executor/layers/mrope.py:415-587,
`_omni_get_input_positions_tensor`) covering interleaved text / audio /
image / video including `use_audio_in_video` time-chunked interleaving.
Verified against the HF thinker's get_rope_index in
tests/multimodal/test_mrope_positions.py.

Semantics:
- pure text (or text+audio with no vision): plain 1D positions on all
  three axes;
- vision present: each modality segment starts at (max position so far + 1);
  text advances all axes; images/videos get (t, h, w) grid positions with
  t stepping `position_id_per_seconds * second_per_grid` per temporal
  patch; audio tokens advance t linearly (25 pos/s);
- use_audio_in_video: video and audio tokens of the same clip are
  interleaved chunkwise per `seconds_per_chunk` with shared start.
- returned delta = max(position) + 1 - seq_len feeds decode-time position
  continuation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np


@dataclass
class MRopeTokenIds:
    image_token_id: int
    video_token_id: int
    audio_token_id: int
    vision_start_token_id: int
    audio_start_token_id: int


@dataclass
class MRopeParams:
    tokens: MRopeTokenIds
    spatial_merge_size: int = 2
    position_id_per_seconds: int = 25
    seconds_per_chunk: int = 2


def _text_seg(length: int, start: int) -> np.ndarray:
    return np.broadcast_to(np.arange(length) + start, (3, length)).copy()


def _vision_seg(
    start: int, t_index: np.ndarray, grid_h: int, grid_w: int, merge: int
) -> np.ndarray:
    gh, gw = grid_h // merge, grid_w // merge
    nt = len(t_index)
    t = np.repeat(np.asarray(t_index, np.int64), gh * gw)
    h = np.tile(np.repeat(np.arange(gh), gw), nt)
    w = np.tile(np.arange(gw), nt * gh)
    return np.stack([t, h, w]) + start


def _audio_len_from_seqlen(mel_len: int) -> int:
    return ((mel_len - 1) // 2 + 1 - 2) // 2 + 1


def _chunk_spans(t_positions: np.ndarray, per_chunk: int, base: int):
    """(start, end) index spans where t positions fall into successive
    per-chunk windows (HF get_chunked_index semantics)."""
    spans = []
    i, start_idx, current = 0, 0, 1
    n = len(t_positions)
    while i < n:
        if t_positions[i] - base >= current * per_chunk:
            spans.append((start_idx, i))
            start_idx = i
            current += 1
        else:
            i += 1
    if start_idx < n:
        spans.append((start_idx, n))
    return spans


def compute_mrope_positions(
    input_ids: Sequence[int],
    params: MRopeParams,
    image_grid_thw: Optional[list[tuple[int, int, int]]] = None,
    video_grid_thw: Optional[list[tuple[int, int, int]]] = None,
    audio_seqlens: Optional[list[int]] = None,
    second_per_grids: Optional[list[float]] = None,
    use_audio_in_video: bool = False,
) -> tuple[np.ndarray, int]:
    """Returns (positions [3, L] int32, mrope_delta)."""
    ids = np.asarray(input_ids, np.int64)
    L = len(ids)
    tk = params.tokens
    merge = params.spatial_merge_size
    pps = params.position_id_per_seconds

    if not image_grid_thw and not video_grid_thw:
        # no vision: plain positions on all axes (HF else branch)
        pos = _text_seg(L, 0)
        return pos.astype(np.int32), 1 + int(pos.max()) - L if L else 0

    image_grid_thw = image_grid_thw or []
    video_grid_thw = video_grid_thw or []
    audio_seqlens = audio_seqlens or []
    second_per_grids = second_per_grids or [1.0] * len(video_grid_thw)

    tokens = ids.tolist()
    segs: list[np.ndarray] = []
    st = 0
    img_i = vid_i = aud_i = 0

    def cur_start() -> int:
        return int(segs[-1].max()) + 1 if segs else 0

    num_images = sum(1 for i, t in enumerate(tokens)
                     if t == tk.vision_start_token_id
                     and i + 1 < L and tokens[i + 1] == tk.image_token_id)
    num_audios = tokens.count(tk.audio_start_token_id)
    if use_audio_in_video:
        num_videos = sum(1 for i, t in enumerate(tokens)
                         if t == tk.vision_start_token_id
                         and i + 1 < L and tokens[i + 1] == tk.audio_start_token_id)
        n_segments = num_images + num_audios
    else:
        num_videos = sum(1 for i, t in enumerate(tokens)
                         if t == tk.vision_start_token_id
                         and i + 1 < L and tokens[i + 1] == tk.video_token_id)
        n_segments = num_images + num_videos + num_audios

    def find(token_id, start, remain) -> int:
        if remain > 0:
            try:
                return tokens.index(token_id, start)
            except ValueError:
                pass
        return L + 1

    remain_i, remain_v, remain_a = num_images, num_videos, num_audios
    for _ in range(n_segments):
        ed_image = find(tk.image_token_id, st, remain_i)
        ed_video = find(tk.video_token_id, st, remain_v)
        ed_audio = find(tk.audio_token_id, st, remain_a)
        min_ed = min(ed_image, ed_video, ed_audio)

        if min_ed == ed_audio:
            text_len = min_ed - st - 1  # text before the audio bos
            if text_len:
                segs.append(_text_seg(text_len, cur_start()))
            segs.append(_text_seg(1, cur_start()))  # audio bos
            alen = _audio_len_from_seqlen(audio_seqlens[aud_i])
            segs.append(_text_seg(alen, cur_start()))  # audio tokens: linear t
            segs.append(_text_seg(1, cur_start()))  # audio eos
            st += text_len + 1 + alen + 1
            aud_i += 1
            remain_a -= 1
        elif min_ed == ed_image:
            text_len = min_ed - st - 1
            if text_len:
                segs.append(_text_seg(text_len, cur_start()))
            segs.append(_text_seg(1, cur_start()))  # vision bos
            gt, gh, gw = image_grid_thw[img_i]
            t_index = (np.arange(gt) * 1 * pps).astype(np.int64)
            start = cur_start()
            segs.append(_vision_seg(start, t_index, gh, gw, merge))
            segs.append(_text_seg(1, cur_start()))  # vision eos
            st += text_len + 1 + gt * (gh // merge) * (gw // merge) + 1
            img_i += 1
            remain_i -= 1
        elif min_ed == ed_video and not use_audio_in_video:
            text_len = min_ed - st - 1
            if text_len:
                segs.append(_text_seg(text_len, cur_start()))
            segs.append(_text_seg(1, cur_start()))
            gt, gh, gw = video_grid_thw[vid_i]
            t_index = (
                np.arange(gt) * float(second_per_grids[vid_i]) * pps
            ).astype(np.int64)
            start = cur_start()
            segs.append(_vision_seg(start, t_index, gh, gw, merge))
            segs.append(_text_seg(1, cur_start()))
            st += text_len + 1 + gt * (gh // merge) * (gw // merge) + 1
            vid_i += 1
            remain_v -= 1
        else:  # video with interleaved audio
            text_len = min_ed - st - 2  # vision bos + audio bos precede
            if text_len:
                segs.append(_text_seg(text_len, cur_start()))
            segs.append(_text_seg(1, cur_start()))  # vision bos
            segs.append(_text_seg(1, int(segs[-1].max())))  # audio bos (same)
            start = cur_start()
            alen = _audio_len_from_seqlen(audio_seqlens[aud_i])
            audio_pos = _text_seg(alen, start)
            gt, gh, gw = video_grid_thw[vid_i]
            t_index = (
                np.arange(gt) * float(second_per_grids[vid_i]) * pps
            ).astype(np.int64)
            video_pos = _vision_seg(start, t_index, gh, gw, merge)
            per_chunk = int(pps * params.seconds_per_chunk)
            v_spans = _chunk_spans(video_pos[0], per_chunk, start)
            a_spans = _chunk_spans(audio_pos[0], per_chunk, start)
            for j in range(max(len(v_spans), len(a_spans))):
                if j < len(v_spans):
                    s, e = v_spans[j]
                    segs.append(video_pos[:, s:e])
                if j < len(a_spans):
                    s, e = a_spans[j]
                    segs.append(audio_pos[:, s:e])
            eos_start = cur_start()
            segs.append(_text_seg(1, eos_start))  # audio eos
            segs.append(_text_seg(1, eos_start))  # vision eos (same)
            vlen = gt * (gh // merge) * (gw // merge)
            st += text_len + 2 + alen + vlen + 2
            aud_i += 1
            vid_i += 1
            remain_v -= 1
            remain_a -= 1

    if st < L:
        segs.append(_text_seg(L - st, cur_start()))

    pos = np.concatenate(segs, axis=1)
    assert pos.shape[1] == L, f"positions {pos.shape[1]} != seq {L}"
    delta = int(pos.max()) + 1 - L
    return pos.astype(np.int32), delta


# ===================================================== Qwen3-Omni variant
def _audio_len_qwen3(mel_len: int) -> int:
    """Parity: qwen3_omni _get_feat_extract_output_lengths."""
    leave = mel_len % 100
    feat = (leave - 1) // 2 + 1
    return ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (mel_len // 100) * 13


def compute_mrope_positions_qwen3(
    input_ids: Sequence[int],
    params: MRopeParams,
    image_grid_thw: Optional[list[tuple[int, int, int]]] = None,
    video_grid_thw: Optional[list[tuple[int, int, int]]] = None,
    audio_seqlens: Optional[list[int]] = None,
    second_per_grids: Optional[list[float]] = None,
    use_audio_in_video: bool = False,
) -> tuple[np.ndarray, int]:
    """Qwen3-Omni position builder (float positions, interleaved M-RoPE;
    HF Qwen3OmniMoeThinkerForConditionalGeneration.get_rope_index):
    segments are detected via vision/audio START tokens, videos step t by
    second_per_grid * 25 as floats, and audio-in-video merges the two
    streams token-by-token ordered by t."""
    ids = np.asarray(input_ids, np.int64)
    L = len(ids)
    tk = params.tokens
    merge = params.spatial_merge_size
    pps = params.position_id_per_seconds

    if not image_grid_thw and not video_grid_thw:
        pos = np.broadcast_to(
            np.arange(L, dtype=np.float32), (3, L)).copy()
        return pos, (1 + int(pos.max()) - L if L else 0)

    image_grid_thw = image_grid_thw or []
    video_grid_thw = video_grid_thw or []
    audio_seqlens = audio_seqlens or []
    second_per_grids = second_per_grids or [1.0] * len(video_grid_thw)

    tokens = ids.tolist()
    segs: list[np.ndarray] = []
    st = 0
    img_i = vid_i = aud_i = 0

    def text_seg(n, start):
        return np.broadcast_to(
            np.arange(n, dtype=np.float64) + start, (3, n)).copy()

    def vision_seg(start, t_index, gh, gw):
        lh, lw = gh // merge, gw // merge
        nt = len(t_index)
        t = np.repeat(np.asarray(t_index, np.float64), lh * lw)
        h = np.tile(np.repeat(np.arange(lh), lw), nt).astype(np.float64)
        w = np.tile(np.arange(lw), nt * lh).astype(np.float64)
        return np.stack([t, h, w]) + start

    num_images = sum(
        1 for i, t in enumerate(tokens)
        if t == tk.vision_start_token_id and i + 1 < L
        and tokens[i + 1] == tk.image_token_id)
    num_videos = sum(
        1 for i, t in enumerate(tokens)
        if t == tk.vision_start_token_id and i + 1 < L
        and tokens[i + 1] in (tk.video_token_id, tk.audio_start_token_id))
    num_audios = tokens.count(tk.audio_start_token_id)
    if use_audio_in_video:
        n_segments = num_images + num_audios
    else:
        n_segments = num_images + num_videos + num_audios

    def cur_max() -> float:
        return float(segs[-1].max()) if segs else -1.0

    remain_v, remain_i, remain_a = num_videos, num_images, num_audios
    for _ in range(n_segments):
        st_idx = cur_max() + 1
        ed_vis = (tokens.index(tk.vision_start_token_id, st)
                  if (remain_i > 0 or remain_v > 0)
                  and tk.vision_start_token_id in tokens[st:] else L + 1)
        ed_aud = (tokens.index(tk.audio_start_token_id, st)
                  if remain_a > 0
                  and tk.audio_start_token_id in tokens[st:] else L + 1)
        min_ed = min(ed_vis, ed_aud)
        text_len = min_ed - st
        if text_len:
            segs.append(text_seg(text_len, st_idx))
            st_idx += text_len
        uaiv_here = (min_ed == ed_vis and min_ed + 1 == ed_aud)
        bos_len = 2 if uaiv_here else 1
        eos_len = 2 if uaiv_here else 1
        segs.append(text_seg(bos_len, st_idx))
        st_idx += bos_len

        if min_ed == ed_aud and not uaiv_here:
            alen = _audio_len_qwen3(audio_seqlens[aud_i])
            segs.append(text_seg(alen, st_idx))
            st += text_len + bos_len + alen + eos_len
            aud_i += 1
            remain_a -= 1
        elif min_ed == ed_vis and tokens[min_ed + 1] == tk.image_token_id:
            gt, gh, gw = image_grid_thw[img_i]
            t_index = np.arange(gt, dtype=np.float64) * 1 * pps
            segs.append(vision_seg(st_idx, t_index, gh, gw))
            st += text_len + bos_len + gt * (gh // merge) * (gw // merge) + eos_len
            img_i += 1
            remain_i -= 1
        elif min_ed == ed_vis and not uaiv_here:
            gt, gh, gw = video_grid_thw[vid_i]
            t_index = (np.arange(gt, dtype=np.float64)
                       * float(second_per_grids[vid_i]) * pps)
            segs.append(vision_seg(st_idx, t_index, gh, gw))
            st += text_len + bos_len + gt * (gh // merge) * (gw // merge) + eos_len
            vid_i += 1
            remain_v -= 1
        else:  # audio in video: merge streams ordered by t
            alen = _audio_len_qwen3(audio_seqlens[aud_i])
            audio_pos = text_seg(alen, st_idx)
            gt, gh, gw = video_grid_thw[vid_i]
            t_index = (np.arange(gt, dtype=np.float64)
                       * float(second_per_grids[vid_i]) * pps)
            video_pos = vision_seg(st_idx, t_index, gh, gw)
            vi = ai = 0
            merged = []
            while vi < video_pos.shape[1] and ai < audio_pos.shape[1]:
                if video_pos[0, vi] <= audio_pos[0, ai]:
                    merged.append(video_pos[:, vi:vi + 1])
                    vi += 1
                else:
                    merged.append(audio_pos[:, ai:ai + 1])
                    ai += 1
            if vi < video_pos.shape[1]:
                merged.append(video_pos[:, vi:])
            if ai < audio_pos.shape[1]:
                merged.append(audio_pos[:, ai:])
            segs.append(np.concatenate(merged, axis=1))
            vlen = gt * (gh // merge) * (gw // merge)
            st += text_len + bos_len + alen + vlen + eos_len
            aud_i += 1
            vid_i += 1
            remain_v -= 1
            remain_a -= 1
        segs.append(text_seg(eos_len, cur_max() + 1))

    if st < L:
        segs.append(text_seg(L - st, cur_max() + 1))

    pos = np.concatenate(segs, axis=1).astype(np.float32)
    assert pos.shape[1] == L, f"positions {pos.shape[1]} != seq {L}"
    delta = int(pos.max()) + 1 - L
    return pos, delta
