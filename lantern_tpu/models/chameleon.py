"""Chameleon-family (Anole / Lumina-mGPT) glue: prompt construction, image
token ranges, vocab translation, and the Lumina grid-constraint FSM.

Reference semantics:
- Anole prompts (ea_model_anole.py:1026-1046): cond = [0] + text + [8710,
  8197] left-padded with 1s; uncond = [1]*(L-2) + [0, 8197]; uncond position
  ids restart (pads at 0, the image-start token at 1), and all subsequent
  uncond positions are cond positions minus ``L - 2``.
- Image tokens occupy BPE ids [4, 8195]; everything else is masked to -inf
  during image generation (ea_model_anole.py:144-146).
- LANTERN nearest-latent tables index VQ codes; BPE ids shift by the image
  token offset 4 (ea_model_anole.py:511).
- Lumina grid FSM (ea_model_lumina_mgpt.py:25-112): inside an image span,
  suppress non-image tokens; force the next-line token every (w+1) tokens and
  the end-of-image token after h*(w+1) tokens — all computed from position
  ids, fully vectorized over tree nodes.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..engine.spec import TokenPrompt

# Chameleon token-space constants
PAD_ID = 1
IMAGE_TOKEN_OFFSET = 4          # VQ code c <-> BPE id c + 4
IMAGE_TOKEN_START = 4
IMAGE_TOKEN_END = 8195          # inclusive
IMAGE_END_ID = 8196             # end-of-image
IMAGE_START_ID = 8197           # begin-of-image
ANOLE_EOT = 8710                # end-of-turn before image
LUMINA_NEWLINE_ID = 8803
LUMINA_GRID_PREFIX = (8197, 8828, 8828)   # 48x48-latent header (768px)
VOCAB = 65536


def non_image_token_mask(vocab_size: int = VOCAB) -> np.ndarray:
    """bool [V]: True on every token outside the image range (masked during
    image-token generation)."""
    m = np.ones((vocab_size,), bool)
    m[IMAGE_TOKEN_START : IMAGE_TOKEN_END + 1] = False
    return m


def shift_nearest_table(table: np.ndarray, vocab_size: int = VOCAB) -> np.ndarray:
    """VQ-code nearest table [n_codes, k] -> BPE-id-indexed table [V, k]
    (equivalent to the reference's ``nearest[x - 4] + 4`` indexing)."""
    V = vocab_size
    out = np.zeros((V, table.shape[1]), np.int32)
    n = table.shape[0]
    out[IMAGE_TOKEN_OFFSET : IMAGE_TOKEN_OFFSET + n] = table + IMAGE_TOKEN_OFFSET
    return out


def bpe_to_img(tokens: np.ndarray) -> np.ndarray:
    """BPE image-token ids -> VQ codes (contiguous-offset scheme)."""
    return np.asarray(tokens) - IMAGE_TOKEN_OFFSET


def img_to_bpe(codes: np.ndarray) -> np.ndarray:
    return np.asarray(codes) + IMAGE_TOKEN_OFFSET


def vocab_map_tables(vocab_map: dict) -> tuple[np.ndarray, np.ndarray]:
    """Build img->bpe / bpe->img tensors from a real tokenizer vocab map with
    IMGIMG-style names (modeling_anole_kv.py:1110-1152), for checkpoints whose
    mapping is not the contiguous offset."""
    chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
    img_tokens = sorted(v for k, v in vocab_map.items() if k.startswith("IMGIMG"))
    name_of = {v: k for k, v in vocab_map.items()}
    bpe2img = {}
    for tok in img_tokens:
        name = name_of[tok]
        code = int("".join(chr_map.get(c, c) for c in name[len("IMGIMG"):-1]))
        bpe2img[tok] = code
    n_codes = max(bpe2img.values()) + 1
    img2bpe = np.zeros((n_codes,), np.int32)
    bpe2img_arr = np.full((max(bpe2img) + 1,), -1, np.int32)
    for b, c in bpe2img.items():
        img2bpe[c] = b
        bpe2img_arr[b] = c
    return img2bpe, bpe2img_arr


def anole_token_prompt(text_tokens: Sequence[int]) -> TokenPrompt:
    """Build the Anole cond/uncond prompt pair (single request)."""
    cond = [0] + list(text_tokens) + [ANOLE_EOT, IMAGE_START_ID]
    L = len(cond)
    uncond = [PAD_ID] * (L - 2) + [0, IMAGE_START_ID]
    tokens = np.stack([cond, uncond]).astype(np.int32)
    cond_pos = np.arange(L)
    uncond_pos = np.zeros((L,), np.int64)
    uncond_pos[-1] = 1
    positions = np.stack([cond_pos, uncond_pos]).astype(np.int32)
    # structural validity: only the uncond row's left pads are invisible
    # (value-based `tokens != PAD_ID` would hide a legitimate text token 1)
    valid = np.ones_like(tokens, dtype=bool)
    valid[1, : L - 2] = False
    return TokenPrompt(
        tokens=jnp.asarray(tokens),
        positions=jnp.asarray(positions),
        valid=jnp.asarray(valid),
        pos_diff=jnp.asarray(L - 2, jnp.int32),
    )


def lumina_token_prompt(text_tokens: Sequence[int],
                        grid: tuple[int, int] = (48, 48)) -> TokenPrompt:
    """Lumina parallel-CFG prompt: cond = text + [image-start, h-grid,
    w-grid]; the uncond branch restarts positions at the image-start token
    (ea_model_lumina_mgpt.py:835-908).  ``grid`` = (h, w) in VQ latents —
    the header tokens must agree with the resolution the grid FSM enforces
    (48x48 latents = the reference's 768px default, header 8828/8828)."""
    from .item_processor import LATENTS_PER_PATCH, grid_token

    h_lat, w_lat = grid
    prefix = (IMAGE_START_ID,
              grid_token(h_lat // LATENTS_PER_PATCH),
              grid_token(w_lat // LATENTS_PER_PATCH))
    cond = list(text_tokens) + list(prefix)
    L = len(cond)
    image_start_idx = L - 3
    uncond = [PAD_ID] * image_start_idx + list(prefix)
    tokens = np.stack([cond, uncond]).astype(np.int32)
    cond_pos = np.arange(L)
    uncond_pos = np.concatenate(
        [np.zeros((image_start_idx,), np.int64), np.arange(3)]
    )
    positions = np.stack([cond_pos, uncond_pos]).astype(np.int32)
    valid = np.ones_like(tokens, dtype=bool)
    valid[1, :image_start_idx] = False
    return TokenPrompt(
        tokens=jnp.asarray(tokens),
        positions=jnp.asarray(positions),
        valid=jnp.asarray(valid),
        pos_diff=jnp.asarray(image_start_idx, jnp.int32),
    )


class LuminaGridFSM(NamedTuple):
    """Position-indexed image-grammar constraints (hashable; usable as a
    static logits_fn factory).  Ids are configurable for small-vocab tests;
    defaults match Lumina-mGPT."""

    w: int                       # latent width (tokens per row)
    h: int                       # latent height
    image_start_idx: int         # index of 8197 in the cond prompt
    vocab_size: int = VOCAB
    newline_id: int = LUMINA_NEWLINE_ID
    image_end_id: int = IMAGE_END_ID
    image_lo: int = IMAGE_TOKEN_START
    image_hi: int = IMAGE_TOKEN_END

    def __call__(self, logits: jnp.ndarray, positions: jnp.ndarray,
                 start=None) -> jnp.ndarray:
        """logits [T, V] scoring the tokens at cond positions+1; constrain per
        the grid state (MultiModalLogitsProcessor semantics with
        position_ids = positions + 1, image_start_token_id_index set).

        ``start`` (traced scalar) overrides the static ``image_start_idx`` —
        the batched engine binds it to each slot's uncond position offset
        (== the prompt's image-start index, ``lumina_token_prompt``) so one
        compiled engine serves ragged prompt lengths (the reference's vLLM
        path batches ragged paired-CFG prompts freely,
        vllm_inference_solver.py:296-306)."""
        if self.newline_id >= self.vocab_size or self.image_end_id >= self.vocab_size:
            # an out-of-range .at[id].set would be silently dropped, leaving
            # forced rows all -inf; small-vocab tests must override the ids
            raise ValueError(
                f"newline_id {self.newline_id} / image_end_id "
                f"{self.image_end_id} outside vocab {self.vocab_size}; "
                "pass fsm overrides for small-vocab configs")
        isi = self.image_start_idx if start is None else start
        neg = jnp.finfo(jnp.float32).min
        n_gen = (positions + 1) - (isi + 1 + 2)                      # [T]
        k = n_gen + 1
        ids = np.arange(self.vocab_size)
        suppress = jnp.asarray((ids < self.image_lo) | (ids > self.image_hi))
        inner = (k % (self.w + 1)) != 0
        logits = jnp.where(inner[:, None] & suppress[None, :], neg, logits)
        newline = (k % (self.w + 1)) == 0
        nl_row = jnp.full((self.vocab_size,), neg).at[self.newline_id].set(0.0)
        logits = jnp.where(newline[:, None], nl_row[None, :], logits)
        eos = k == (self.w + 1) * self.h + 1
        eos_row = jnp.full((self.vocab_size,), neg).at[self.image_end_id].set(0.0)
        logits = jnp.where(eos[:, None], eos_row[None, :], logits)
        return logits
