"""T5 caption embedder for LlamaGen t2i.

Reference: models/base_models/llamagen/t5.py — flan-t5-xl encoder, captions
cleaned and padded/truncated to 120 tokens; downstream, embeddings are
flipped so padding sits on the LEFT and pad rows are zeroed
(modeling_llamagen_kv.py:1387-1397).

The encoder itself runs offline on CPU via transformers (it is not part of
the TPU decode hot path; its output is the conditioning prefix).  When no
checkpoint is available (this environment has no network), ``RandomT5``
produces shape-compatible embeddings so the full pipeline stays runnable.
"""

from __future__ import annotations

import html
import re
import urllib.parse as ul

import numpy as np


def clean_caption(caption: str) -> str:
    """Light version of the reference's caption cleaning (t5.py): strip urls,
    html tags, and collapse whitespace."""
    caption = str(caption).lower().strip()
    caption = ul.unquote_plus(caption)
    caption = re.sub(r"<person>", "person", caption)
    caption = re.sub(r"\b(?:https?:|www\.)\S+", "", caption)
    caption = re.sub(r"<[^>]+>", "", caption)
    caption = html.unescape(html.unescape(caption))
    caption = re.sub(r"\s+", " ", caption)
    return caption.strip()


class T5Embedder:
    """flan-t5-xl encoder wrapper (torch CPU)."""

    def __init__(self, model_dir: str, model_max_length: int = 120):
        import torch
        from transformers import AutoTokenizer, T5EncoderModel

        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
        self.model = T5EncoderModel.from_pretrained(model_dir).eval()
        self.model_max_length = model_max_length

    def get_text_embeddings(self, prompts):
        texts = [clean_caption(p) for p in prompts]
        tok = self.tokenizer(
            texts, max_length=self.model_max_length, padding="max_length",
            truncation=True, return_tensors="pt",
        )
        with self.torch.no_grad():
            emb = self.model(
                input_ids=tok["input_ids"], attention_mask=tok["attention_mask"]
            ).last_hidden_state
        return emb.numpy(), tok["attention_mask"].numpy()


class RandomT5:
    """Deterministic per-prompt pseudo-embeddings; keeps the t2i pipeline
    runnable without the flan-t5-xl checkpoint (zero-egress environments)."""

    def __init__(self, dim: int = 2048, model_max_length: int = 120):
        self.dim = dim
        self.model_max_length = model_max_length

    def get_text_embeddings(self, prompts):
        import hashlib

        embs, masks = [], []
        for p in prompts:
            # stable digest: builtin hash() is salted per process
            # (PYTHONHASHSEED), which would silently change the "same"
            # prompt's embedding between data-gen and inference runs
            digest = hashlib.sha1(clean_caption(p).encode()).digest()
            seed = int.from_bytes(digest[:4], "little") % (2 ** 31)
            rng = np.random.default_rng(seed)
            n = min(max(len(p.split()), 1) + 2, self.model_max_length)
            e = np.zeros((self.model_max_length, self.dim), np.float32)
            e[:n] = rng.normal(size=(n, self.dim)).astype(np.float32) * 0.5
            m = np.zeros((self.model_max_length,), np.int64)
            m[:n] = 1
            embs.append(e)
            masks.append(m)
        return np.stack(embs), np.stack(masks)


def flip_for_left_padding(emb: np.ndarray, mask: np.ndarray):
    """Move valid caption rows to the right / pads to the left and zero pad
    rows, per the reference CFG prompt layout."""
    out_e = np.zeros_like(emb)
    out_m = mask[:, ::-1].copy()
    for i in range(emb.shape[0]):
        n = int(mask[i].sum())
        out_e[i, emb.shape[1] - n:] = emb[i, :n]
    out_e = out_e * out_m[:, :, None]
    return out_e, out_m
