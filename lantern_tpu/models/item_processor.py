"""Lumina-mGPT flexible-resolution item processing (FlexARItemProcessor).

TPU-native equivalent of the reference's prompt/image item pipeline
(models/base_models/lumina_mgpt/item_processor.py:36-199,
inference_solver.py:474-505):

- crop-size enumeration and variable center-crop to the nearest token grid,
- PIL image -> Chameleon VQGAN codes -> BPE ids with per-row newline tokens,
  wrapped ``[image_start, h_grid_tok, w_grid_tok, ..., image_end]``,
- the reverse ``decode_image`` / ``decode_ids`` walk that splits generated
  streams into text spans and decoded PIL-ready pixel arrays.

Token-id conventions (Lumina BPE space): reserved token ``<reservedNNNNN>``
has BPE id ``NNNNN + 4`` — newline ``<reserved08799>`` = 8803, the n-grids
token = ``8804 + n`` (reference decode_image: ``tokens[0] - 8804``,
item_processor.py:106-112 via token2id). Patch size 32 px = 2 VQ latents.

Text tokenization is pluggable: pass any ``encode(str) -> List[int]``
callable (the real Lumina BPE on a host with the tokenizer files); a
deterministic hash fallback keeps the pipeline runnable end-to-end in this
zero-egress environment.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from . import chameleon as cham
from . import vqgan

PATCH_SIZE = 32                  # pixels per grid token
LATENTS_PER_PATCH = 2            # VQGAN downsamples 16x; 32px patch = 2 latents
GRID_TOKEN_BASE = 8804           # BPE id of <reserved08800> == n_grids 0


def grid_token(n_grids: int) -> int:
    return GRID_TOKEN_BASE + n_grids


def generate_crop_size_list(num_patches: int, patch_size: int = PATCH_SIZE,
                            max_ratio: float = 4.0) -> List[Tuple[int, int]]:
    """All (w, h) pixel sizes with w/32 * h/32 <= num_patches, aspect ratio
    <= max_ratio, walking the Pareto frontier (item_processor.py:45-56)."""
    assert max_ratio >= 1.0
    out = []
    wp, hp = num_patches, 1
    while wp > 0:
        if max(wp, hp) / min(wp, hp) <= max_ratio:
            out.append((wp * patch_size, hp * patch_size))
        if (hp + 1) * wp <= num_patches:
            hp += 1
        else:
            wp -= 1
    return out


def var_center_crop_size(w: int, h: int,
                         crop_size_list: Sequence[Tuple[int, int]],
                         random_top_k: int = 1,
                         rng: Optional[np.random.Generator] = None):
    """Pick the crop size whose aspect best matches (item_processor.py:36-42)."""
    rem = [min(cw / w, ch / h) / max(cw / w, ch / h) for cw, ch in crop_size_list]
    ranked = sorted(zip(rem, crop_size_list), reverse=True)[:random_top_k]
    if len(ranked) > 1 and rng is not None:
        return ranked[int(rng.integers(len(ranked)))][1]
    return ranked[0][1]


def center_crop(image: np.ndarray, cw: int, ch: int) -> np.ndarray:
    """uint8 HWC center crop, rescaling first (up or down, bilinear) so the
    short edge covers the crop."""
    h, w = image.shape[:2]
    scale = max(cw / w, ch / h)
    if scale != 1.0:
        from PIL import Image as PILImage

        nw, nh = max(cw, int(round(w * scale))), max(ch, int(round(h * scale)))
        image = np.asarray(
            PILImage.fromarray(image).resize((nw, nh), PILImage.LANCZOS))
        h, w = image.shape[:2]
    top, left = (h - ch) // 2, (w - cw) // 2
    return image[top : top + ch, left : left + cw]


def codes_to_image_tokens(codes: np.ndarray) -> List[int]:
    """VQ code grid [h_lat, w_lat] -> flat Lumina BPE token list with the
    grid header, per-row newline tokens and the end-of-image token."""
    h_lat, w_lat = codes.shape
    assert h_lat % LATENTS_PER_PATCH == 0 and w_lat % LATENTS_PER_PATCH == 0
    bpe = cham.img_to_bpe(codes)
    rows = np.concatenate(
        [bpe, np.full((h_lat, 1), cham.LUMINA_NEWLINE_ID, np.int64)], axis=1
    ).reshape(-1)
    return [
        cham.IMAGE_START_ID,
        grid_token(h_lat // LATENTS_PER_PATCH),
        grid_token(w_lat // LATENTS_PER_PATCH),
        *rows.tolist(),
        cham.IMAGE_END_ID,
    ]


def image_tokens_to_codes(tokens: Sequence[int]) -> Tuple[np.ndarray, int, int]:
    """Reverse of ``codes_to_image_tokens`` (decode_image walk,
    inference_solver.py:504-505 -> item_processor.py decode_image)."""
    toks = list(tokens)
    if toks and toks[0] == cham.IMAGE_START_ID:
        toks = toks[1:]
    if toks and toks[-1] == cham.IMAGE_END_ID:
        toks = toks[:-1]
    h_grids, w_grids = toks[0] - GRID_TOKEN_BASE, toks[1] - GRID_TOKEN_BASE
    if not (0 < h_grids <= 64 and 0 < w_grids <= 64):
        raise ValueError(f"bad grid header {toks[:2]}")
    toks = toks[2:]
    h_lat, w_lat = h_grids * LATENTS_PER_PATCH, w_grids * LATENTS_PER_PATCH
    if len(toks) != h_lat * (w_lat + 1):
        raise ValueError(
            f"image span has {len(toks)} tokens, want {h_lat}x({w_lat}+1)")
    grid = np.asarray(toks, np.int64).reshape(h_lat, w_lat + 1)[:, :-1]
    return cham.bpe_to_img(grid), h_lat, w_lat


def hash_tokenize(text: str, vocab_lo: int = 10000, vocab_hi: int = 55000
                  ) -> List[int]:
    """Deterministic fallback text tokenizer (word-hash into the text-token
    range) so prompt pipelines run without the proprietary BPE files."""
    out = []
    for word in text.split():
        h = 2166136261
        for ch in word.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        out.append(vocab_lo + h % (vocab_hi - vocab_lo))
    return out


@dataclasses.dataclass
class FlexARItemProcessor:
    """Conversation -> token stream with inline images (Lumina flavor).

    ``qas`` items follow the reference's ``[[question, answer], ...]``
    conversation shape (eagle_inference_solver.py:262-357); ``<|image|>``
    placeholders in a question splice in the corresponding image's tokens.
    """

    vq_params: Optional[dict] = None
    vq_cfg: Optional[vqgan.VQGANConfig] = None
    target_size: int = 768
    tokenizer: Optional[Callable[[str], List[int]]] = None

    def __post_init__(self):
        self.crop_size_list = generate_crop_size_list(
            (self.target_size // PATCH_SIZE) ** 2, PATCH_SIZE)
        if self.tokenizer is None:
            self.tokenizer = hash_tokenize

    # -- images --------------------------------------------------------
    def process_image(self, image: np.ndarray) -> List[int]:
        if self.vq_params is None:
            raise ValueError("FlexARItemProcessor needs vq_params to encode "
                             "images (pass the Chameleon VQGAN checkpoint)")
        import jax.numpy as jnp

        cw, ch = var_center_crop_size(image.shape[1], image.shape[0],
                                      self.crop_size_list)
        img = center_crop(image, cw, ch)
        x = jnp.asarray(img[None], jnp.float32) / 127.5 - 1.0
        codes = np.asarray(vqgan.encode(self.vq_params, self.vq_cfg, x))[0]
        h_lat = ch // (PATCH_SIZE // LATENTS_PER_PATCH)
        w_lat = cw // (PATCH_SIZE // LATENTS_PER_PATCH)
        return codes_to_image_tokens(codes.reshape(h_lat, w_lat))

    def decode_image(self, tokens: Sequence[int]) -> np.ndarray:
        if self.vq_params is None:
            raise ValueError("decode_image needs vq_params")
        import jax.numpy as jnp

        codes, h_lat, w_lat = image_tokens_to_codes(tokens)
        px = vqgan.decode_code(self.vq_params, self.vq_cfg,
                               jnp.asarray(codes.reshape(1, -1)),
                               grid=(h_lat, w_lat))
        arr = np.asarray(px)[0]
        return np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)

    # -- conversations -------------------------------------------------
    def process_item(self, qas: Sequence[Sequence[Optional[str]]],
                     images: Sequence[np.ndarray] = ()) -> List[int]:
        """Flatten a [[q, a], ...] conversation; ``<|image|>`` in any turn
        splices the next image's token span. A trailing ``None`` answer ends
        the prompt for generation."""
        img_iter = iter(images)
        out: List[int] = []
        for q, a in qas:
            for turn in (q, a):
                if turn is None:
                    continue
                parts = turn.split("<|image|>")
                for i, part in enumerate(parts):
                    if i > 0:
                        out.extend(self.process_image(next(img_iter)))
                    if part.strip():
                        out.extend(self.tokenizer(part.strip()))
        return out

    def decode_ids(self, tokens: Sequence[int]):
        """Split a generated stream into text-token spans and decoded
        images (inference_solver.py:474-499)."""
        texts: List[List[int]] = []
        images: List[np.ndarray] = []
        cur: List[int] = []
        toks = list(tokens)
        i = 0
        while i < len(toks):
            if toks[i] == cham.IMAGE_START_ID:
                try:
                    j = toks.index(cham.IMAGE_END_ID, i + 1)
                except ValueError:
                    break  # truncated image span
                images.append(self.decode_image(toks[i : j + 1]))
                if cur:
                    texts.append(cur)
                    cur = []
                i = j + 1
            else:
                cur.append(toks[i])
                i += 1
        if cur:
            texts.append(cur)
        return texts, images
