"""Shared test fake: a minimal CLIP-shaped tokenizer (no vocab files).

bos=97 + word-hash ids + eos=98, pad=0; honors padding=True /
"max_length", truncation to model_max_length, and return_tensors "np"/"pt"
(with the `.to(device)` shim HF encodings have). Used by the flax-CLIP
parity tests and the serving predictor engine test.
"""

import numpy as np


class FakeClipTokenizer:
    def __init__(self, vocab=97, bos=97, eos=98, model_max_length=12):
        self.vocab, self.bos, self.eos = vocab, bos, eos
        self.model_max_length = model_max_length

    def __call__(self, texts, padding=True, max_length=None, truncation=True,
                 return_tensors="np"):
        cap = max_length or self.model_max_length
        rows = []
        for t in texts:
            ids = [self.bos] + [hash(w) % 96 + 1 for w in t.split()] + [self.eos]
            if truncation and len(ids) > cap:
                ids = ids[: cap - 1] + [self.eos]
            rows.append(ids)
        width = cap if padding == "max_length" else max(map(len, rows))
        ids = np.zeros((len(rows), width), np.int64)
        attn = np.zeros((len(rows), width), np.int64)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            attn[i, : len(r)] = 1
        out = {"input_ids": ids, "attention_mask": attn}
        if return_tensors == "pt":
            import torch

            out = {k: torch.from_numpy(v) for k, v in out.items()}

            class _Enc(dict):
                def to(self, device):
                    return self

            return _Enc(out)
        return out
