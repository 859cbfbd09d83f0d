"""Multi-scale variable-length window training sampler (ECCV'22 recipe).

Counterpart of cone/ego4d_dataloader_for_eccv2022_workshop.py:179-235: per
training example, besides the standard positive window, draw THREE extra
windows of random length (0.4-2x of the window size, always covering the
GT span, random placement) as additional Moment-DETR training rows. The
matching/adapter branch keeps only the standard window.

Fixed-shape packing: every motion window (standard + extra) is padded to
2 * max_v_l clips (extra windows can reach twice the window size); the
appearance branch keeps the standard max_v_l shape. A batch is
    rows [0, B)        standard windows (with appearance/adapter fields)
    rows [B, 4B)       extra multiscale windows
ordered so the train step can apply the adapter NCE to the first B rows.
"""

from __future__ import annotations

import math

import numpy as np

from cone_tpu.data.dataset import GroundingDataset, TrainLoader

RATIO_BANDS = [(0.4, 0.6), (0.6, 0.8), (0.8, 1.0)]


def sample_multiscale_windows(ds: GroundingDataset, index: int,
                              rng: np.random.Generator):
    """The 3 extra (start, end) windows for one example
    (dataloader:183-205 geometry)."""
    cfg = ds.cfg
    ex = ds.examples[index]
    stride = ds.stride
    ctx_l = len(ds.video_features(ex.clip_id)[0])
    start = min(ctx_l, ex.timestamps[0] / cfg.clip_length)
    end = min(ctx_l, ex.timestamps[1] / cfg.clip_length)

    out = []
    for lo, hi in RATIO_BANDS:
        gt_ratio = math.ceil(end - start) / stride
        min_ratio = min(lo, max(hi, gt_ratio))
        max_ratio = max(hi * 2, min(lo * 2, 2 * gt_ratio))
        sw_len_ratio = rng.uniform(min_ratio, max_ratio)
        window_length = int(stride * 2 * sw_len_ratio)

        rand_start_choice = max(0, math.ceil(end) - window_length)
        rand_end_choice = min(math.floor(start), ctx_l - window_length)
        lo_c, hi_c = sorted((rand_start_choice, rand_end_choice))
        new_start = int(rng.integers(lo_c, hi_c)) if lo_c < hi_c else lo_c
        # clamp: when ctx_l < window_length, rand_end_choice is negative
        # and the draw can land below 0 — the reference's ragged tensors
        # silently produced a short slice there; a fixed-shape copy would
        # crash on the broadcast (and a negative python slice wraps)
        new_start = max(new_start, 0)
        new_end = min(new_start + window_length, ctx_l)
        out.append((new_start, new_end, window_length))
    return out


class MultiscaleTrainLoader(TrainLoader):
    """Batches with 4 windows per example: [standard x B ; extra x 3B]."""

    def epoch(self, epoch_i: int, lo: int = 0, hi=None):
        # the [standard x B ; extra x 3B] batch layout is position-dependent
        # (the train step applies the adapter NCE to the first B rows), so
        # the base class's per-process row-slice contract does not compose
        # with it — reject multi-host slicing explicitly rather than
        # producing misaligned global batches
        assert lo == 0 and hi is None, (
            "MultiscaleTrainLoader is single-host: its [std; extra] batch"
            " layout cannot be row-sliced per process")
        cfg = self.ds.cfg
        pad_l = 2 * cfg.max_v_l
        rng = np.random.default_rng((self.seed, epoch_i, 0x6D73))  # "ms"
        order = rng.permutation(len(self.ds))
        _, motion_all = self.ds.video_features(self.ds.examples[0].clip_id)
        dv = motion_all.shape[1]

        for b in range(self.steps_per_epoch()):
            idxs = order[b * self.bsz : (b + 1) * self.bsz]
            std = [
                self.ds.sample_train(
                    int(i), np.random.default_rng((self.seed, epoch_i, int(i)))
                )
                for i in idxs
            ]
            base = {k: np.stack([s[k] for s in std]) for k in std[0]}

            def pad_to(x, l):
                out = np.zeros((x.shape[0], l) + x.shape[2:], x.dtype)
                out[:, : x.shape[1]] = x
                return out

            rows_motion = [pad_to(base["pos_motion"], pad_l)]
            rows_mask = [pad_to(base["pos_mask"], pad_l)]
            rows_neg = [pad_to(base["neg_motion"], pad_l)]
            rows_negm = [pad_to(base["neg_mask"], pad_l)]
            rows_span = [base["span_labels"]]
            rows_spanm = [base["span_mask"]]
            rows_salp = [base["sal_pos"]]
            rows_saln = [base["sal_neg"]]
            rows_q = [base["query_tokens"]]
            rows_qm = [base["query_mask"]]

            extra = {k: [] for k in
                     ["motion", "mask", "neg", "negm", "span", "salp", "saln",
                      "q", "qm"]}
            for i in idxs:
                i = int(i)
                ex = self.ds.examples[i]
                _, motion = self.ds.video_features(ex.clip_id)
                ctx_l = len(motion)
                start = min(ctx_l, ex.timestamps[0] / cfg.clip_length)
                end = min(ctx_l, ex.timestamps[1] / cfg.clip_length)
                tok, _ = self.ds.query_features(ex.query_id)
                q = np.zeros((cfg.max_q_l, tok.shape[1]), np.float32)
                q[: len(tok)] = tok
                qm = np.zeros(cfg.max_q_l, np.float32)
                qm[: len(tok)] = 1

                for w_start, w_end, w_len_nominal in sample_multiscale_windows(
                    self.ds, i, rng
                ):
                    w_len = w_end - w_start
                    m = np.zeros((pad_l, dv), np.float32)
                    m[: min(w_len, pad_l)] = motion[w_start : w_start + min(w_len, pad_l)]
                    msk = np.zeros(pad_l, np.float32)
                    msk[: min(w_len, pad_l)] = 1

                    start_pos = max(start - w_start, 0.0)
                    end_pos = min(end - w_start, float(w_len_nominal))
                    st_n = start_pos / max(w_len, 1)
                    ed_n = min(end_pos, w_len) / max(w_len, 1)
                    span = np.zeros((cfg.max_windows, 2), np.float32)
                    span[0] = [(st_n + ed_n) / 2, ed_n - st_n]

                    rel = list(range(int(math.floor(start_pos)),
                                     int(math.ceil(min(end_pos, w_len))))) or [
                        int(math.floor(start_pos))
                    ]
                    neg_pool = sorted(set(range(w_len)) - set(rel)) or [0]
                    salp = np.array([int(rng.choice(rel))], np.int32)
                    saln = np.array([int(rng.choice(neg_pool))], np.int32)

                    # a fresh standard-size negative window (just the
                    # slice — a full sample_train here would triple the
                    # loader's per-example sampling cost to throw most of
                    # it away)
                    neg = np.zeros((pad_l, dv), np.float32)
                    negm = np.zeros(pad_l, np.float32)
                    nm, nmask = self.ds.sample_negative_window(i, rng)
                    neg[: cfg.max_v_l] = nm
                    negm[: cfg.max_v_l] = nmask

                    extra["motion"].append(m)
                    extra["mask"].append(msk)
                    extra["neg"].append(neg)
                    extra["negm"].append(negm)
                    extra["span"].append(span)
                    extra["salp"].append(salp)
                    extra["saln"].append(saln)
                    extra["q"].append(q)
                    extra["qm"].append(qm)

            batch = dict(base)
            batch["pos_motion"] = np.concatenate(
                rows_motion + [np.stack(extra["motion"])]
            )
            batch["pos_mask"] = np.concatenate(rows_mask + [np.stack(extra["mask"])])
            batch["neg_motion"] = np.concatenate(rows_neg + [np.stack(extra["neg"])])
            batch["neg_mask"] = np.concatenate(rows_negm + [np.stack(extra["negm"])])
            batch["span_labels"] = np.concatenate(rows_span + [np.stack(extra["span"])])
            batch["span_mask"] = np.concatenate(
                rows_spanm
                + [np.stack([_one_hot_first(cfg.max_windows)
                             for _ in extra["span"]])]
            )
            batch["sal_pos"] = np.concatenate(rows_salp + [np.stack(extra["salp"])])
            batch["sal_neg"] = np.concatenate(rows_saln + [np.stack(extra["saln"])])
            batch["query_tokens"] = np.concatenate(rows_q + [np.stack(extra["q"])])
            batch["query_mask"] = np.concatenate(rows_qm + [np.stack(extra["qm"])])
            yield batch


def _one_hot_first(n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    out[0] = 1
    return out
