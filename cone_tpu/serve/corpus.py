"""Corpus-level moment retrieval: one query searched across EVERY resident
video.

The reference (and the per-video pipeline) always grounds a query in the
video named by its annotation (`clip_id`). With the corpus HBM-resident
(eval/pipeline.py `_device_video`, optionally quantized via
eval.corpus_dtype), cross-video search is the same machinery pointed at
all videos at once:

  1. coarse: the query's CLS feature scores every window of every resident
     video (one matvec + segment-max per video, compiled once per ctx
     bucket; all dispatches issued before any fetch);
  2. global merge: top `search_windows` (video, window) pairs by coarse
     score across the whole corpus (host, tiny);
  3. fine: the selected windows group by video into the standard batched
     fine forward (the per-video pipeline's own `_fine_fn`);
  4. post: reference-semantics scoring per video — min-max fusion over the
     query's candidate set, NMS *within* each video (cross-video temporal
     IoU is meaningless) — then one global ranking by fusion score.

No reference counterpart (cone/inference.py grounds per annotation);
the scoring math inside each stage is the per-video pipeline's, tested
against the reference. Results: [video_id, st, ed, prop, match, fusion].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cone_tpu.config import ConeConfig
from cone_tpu.data.dataset import GroundingDataset
from cone_tpu.data.store import InMemoryArrayStore, TextFeatureStore
from cone_tpu.eval.pipeline import make_pipeline
from cone_tpu.ops.nms import temporal_nms_host
from cone_tpu.ops.windows import num_windows
from cone_tpu.utils.io import min_max_normalize


class CorpusRetriever:
    """Search one query — or a batch — against all resident videos.

    Built on a dedicated `InferencePipeline` (fine programs compiled at
    `fine_chunk` query lanes); video features upload once (quantized per
    eval.corpus_dtype, stacked per ctx bucket) and are shared across
    searches.
    """

    def __init__(self, model, params, cfg: ConeConfig,
                 dataset: Optional[GroundingDataset] = None,
                 fine_chunk: int = 8, mesh=None):
        # fine_chunk: queries batched per fine dispatch in search_batch
        # (and the padding width of a single-query search — its fine cost
        # is dominated by the dispatch round trip, not the extra lanes).
        # mesh: shard the LIBRARY over the `dp` axis — each chip holds and
        # coarse-scans its own movies, so capacity and scan throughput
        # scale linearly with chips (zero collectives; the tiny (V, Q, n_w)
        # score tensor is the only cross-chip traffic, at fetch time).
        cfg = cfg.replace(
            eval=dataclasses.replace(cfg.eval, query_chunk=fine_chunk))
        self.cfg = cfg
        self.fine_chunk = fine_chunk
        self.mesh = mesh
        ds = dataset if dataset is not None else self._empty_ds()
        # the pipeline's mesh shardings also cover the fine program (its
        # query-lane axis shards over dp; the sliced movie inputs reshard
        # to replicated automatically via the jit in_shardings); the
        # family-dispatching constructor lets a TAN model serve the corpus
        self.pipe = make_pipeline(model, params, ds, cfg, mesh=mesh)
        self.clip_ids: List[str] = (
            sorted({e.clip_id for e in ds.examples}) if dataset is not None
            else []
        )
        if dataset is not None:
            # also admit videos the dataset knows but no example references
            try:
                self.clip_ids = sorted(set(self.clip_ids)
                                       | set(ds.appear.keys()))
            except (AttributeError, TypeError):
                pass
        # scores variant of the pipeline's coarse program: same adapter +
        # frame-score + segment-max math as eval/pipeline.py adapt_core +
        # coarse_fn, but (a) returns the scores themselves for the
        # cross-video merge, and (b) runs over a whole STACKED bucket of
        # movies in ONE dispatch — per-dispatch overhead (~ms over a
        # tunnel) dwarfs the per-movie device work (~25 us for a 2 h movie
        # int8), so one-dispatch-per-movie scanning is overhead-bound.
        from cone_tpu.ops.windows import window_scores_from_frame_scores

        stride = self.pipe.stride
        mcfg = self.cfg.model
        adapter_module = (self.cfg.tan.adapter_module
                          if mcfg.model_family == "tan"
                          else mcfg.adapter_module)
        model_ = model

        @jax.jit
        def stacked_scores(params, A, S, ctx, clss):
            """(V, Lb, D) encoded corpus + scales + (V,) ctx + (Q, D)
            query CLS batch -> (V, Q, n_w) window scores. Any number of
            queries rides the same per-bucket dispatch — the matmul grows
            a lane, the HBM stream (the cost) does not."""
            max_w = num_windows(A.shape[1], stride)

            def one(a, s, c):
                feats = a.astype(jnp.float32) * s
                # per-family adapter knob, like eval/pipeline.py adapt_core
                if adapter_module == "linear":
                    out = model_.apply({"params": params}, feats,
                                       method=type(model_).adapt)
                    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
                    feats = out / jnp.where(norm == 0, 1.0, norm)
                frame = clss @ feats.T  # (Q, Lb)
                return jax.vmap(
                    lambda fq: window_scores_from_frame_scores(
                        fq, c, stride, max_w)[0]
                )(frame)  # (Q, n_w)

            return jax.vmap(one)(A, S, ctx)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            vsh = NamedSharding(mesh, P("dp"))
            stacked_scores = jax.jit(
                stacked_scores.__wrapped__,
                in_shardings=(rep, vsh, vsh, vsh, rep),
                out_shardings=vsh,
            )
        self._stacked_scores = stacked_scores
        self._stacked = None  # {bucket_len: (ids, A, S, ctx_arr)}

    def _empty_ds(self):
        text = TextFeatureStore(InMemoryArrayStore({}), InMemoryArrayStore({}))
        return GroundingDataset([], InMemoryArrayStore({}), text,
                                self.cfg.data)

    # -------------------------------------------------------------- corpus

    def add_video(self, clip_id: str, feats: np.ndarray,
                  motion_feats: Optional[np.ndarray] = None) -> None:
        """Add/replace one video's (L, D) clip features; uploads (encoded
        per eval.corpus_dtype) on first use. Features are L2-normalized
        like the dataset path (data/dataset.py video_features).

        `motion_feats` supplies the Moment-DETR branch's stream for
        dual-stream corpora (same_visual=False datasets); omitted, the
        appearance features serve both branches."""
        from cone_tpu.utils.io import l2_normalize

        ap = np.asarray(feats, np.float32)
        if self.cfg.data.normalize_v:
            ap = l2_normalize(ap)
        if motion_feats is None:
            mo = ap
        else:
            mo = np.asarray(motion_feats, np.float32)
            assert len(mo) == len(ap), (clip_id, len(ap), len(mo))
            if self.cfg.data.normalize_v:
                mo = l2_normalize(mo)
        self.pipe.ds.pin_video(clip_id, ap, mo)  # eviction-exempt: no store
        self.pipe._dev_cache = getattr(self.pipe, "_dev_cache", {})
        self.pipe._dev_cache.pop(clip_id, None)
        self._stacked = None  # rebuild the stacked corpus lazily
        if clip_id not in self.clip_ids:
            self.clip_ids.append(clip_id)

    def append_video(self, clip_id: str, feats: np.ndarray,
                     motion_feats: Optional[np.ndarray] = None) -> int:
        """Streaming ingest: extend a RESIDENT video's timeline with new
        (L_new, D) clip features (a live feed growing between searches).
        Bit-identical to add_video() of the full concatenation — only the
        new rows normalize, the grown video re-encodes/re-uploads lazily on
        the next search, and every earlier moment keeps its timestamps
        (windows are anchored at the video start). Returns the new length.
        No reference counterpart (the reference grounds only complete,
        pre-extracted videos)."""
        from cone_tpu.utils.io import l2_normalize

        ap_old, mo_old = self.pipe.ds.video_features(clip_id)
        dual = mo_old is not ap_old
        assert not (dual and motion_feats is None), (
            f"{clip_id} is dual-stream: append needs motion_feats")
        ap_new = np.asarray(feats, np.float32)
        if self.cfg.data.normalize_v:
            ap_new = l2_normalize(ap_new)
        ap = np.concatenate([ap_old, ap_new])
        if dual or motion_feats is not None:
            mo_new = np.asarray(motion_feats, np.float32)
            assert len(mo_new) == len(ap_new), (clip_id, len(ap_new),
                                                len(mo_new))
            if self.cfg.data.normalize_v:
                mo_new = l2_normalize(mo_new)
            mo = np.concatenate([mo_old, mo_new])
        else:
            mo = ap
        assert len(ap) <= self.cfg.data.max_ctx_l, (
            f"{clip_id} grew past data.max_ctx_l "
            f"({len(ap)} > {self.cfg.data.max_ctx_l})")
        self.pipe.ds.pin_video(clip_id, ap, mo)
        self.pipe._dev_cache = getattr(self.pipe, "_dev_cache", {})
        self.pipe._dev_cache.pop(clip_id, None)
        self._stacked = None
        return len(ap)

    def remove_video(self, clip_id: str) -> None:
        """Evict one video from the serving library (its share of HBM is
        reclaimed at the next search's lazy restack). Raises ValueError for
        ids not in the library. A dataset-backed video is only evicted from
        the LIBRARY — the backing store is untouched."""
        self.clip_ids.remove(clip_id)
        self.pipe.ds._vid_cache.pop(clip_id, None)
        self.pipe.ds._pinned.discard(clip_id)
        self.pipe._dev_cache = getattr(self.pipe, "_dev_cache", {})
        self.pipe._dev_cache.pop(clip_id, None)
        self._stacked = None

    def save_corpus(self, dir_path: str) -> int:
        """Persist the resident library to packed .cfs stores
        (`appearance.cfs` + `motion.cfs` when dual-stream) so a server
        restart — or another replica — rebuilds it with load_corpus().
        Live-ingested videos (add_video/append_video) have no backing
        store; this is their durability path. Stored features are the
        normalized resident arrays, so the reload is bit-exact."""
        import os

        from cone_tpu.data.store import write_packed_store

        appear, motion = {}, {}
        for cid in self.clip_ids:
            ap, mo = self.pipe.ds.video_features(cid)
            appear[cid] = ap
            if mo is not ap:  # only truly-dual videos carry a motion row —
                motion[cid] = mo  # single-stream ones reload as one array
        os.makedirs(dir_path, exist_ok=True)
        write_packed_store(os.path.join(dir_path, "appearance.cfs"), appear)
        if motion:
            write_packed_store(os.path.join(dir_path, "motion.cfs"), motion)
        return len(appear)

    def load_corpus(self, dir_path: str) -> int:
        """Rebuild a save_corpus() library: every stored video pins into
        the dataset cache exactly as saved (no re-normalization) and
        uploads lazily on the next search."""
        import os

        from cone_tpu.data.store import PackedArrayStore

        ap_store = PackedArrayStore(os.path.join(dir_path, "appearance.cfs"))
        mo_path = os.path.join(dir_path, "motion.cfs")
        mo_store = PackedArrayStore(mo_path) if os.path.exists(mo_path) else None
        self.pipe._dev_cache = getattr(self.pipe, "_dev_cache", {})
        for cid in sorted(ap_store.keys()):
            ap = np.ascontiguousarray(ap_store.get(cid), dtype=np.float32)
            mo = (np.ascontiguousarray(mo_store.get(cid), dtype=np.float32)
                  if mo_store is not None and cid in mo_store else ap)
            self.pipe.ds.pin_video(cid, ap, mo)
            self.pipe._dev_cache.pop(cid, None)
            if cid not in self.clip_ids:
                self.clip_ids.append(cid)
        self._stacked = None
        return len(list(ap_store.keys()))

    # -------------------------------------------------------------- search

    def rank_videos(self, cls_feat: np.ndarray) -> List[tuple]:
        """Coarse-only corpus ranking: [(video_id, best_window_score)]
        descending. This is the retrieval signal (query-frame cosine via
        the trained adapter, cone/inference.py:276-299 generalized across
        videos); the fine stage refines *moments* within the shortlist."""
        scored = self._coarse_all(np.asarray(cls_feat, np.float32)[None])
        best = {
            cid: float(np.max(scores[0][:num_windows(ctx_l, self.pipe.stride)]))
            for cid, ctx_l, scores in scored
        }
        return sorted(best.items(), key=lambda kv: -kv[1])

    def _ensure_stacked(self):
        """Group the corpus by padded bucket length into stacked device
        tensors ((V, Lb, D) features + scales + (V,) ctx). Per-video cache
        entries are dropped afterwards — the stack IS the resident corpus;
        the fine stage slices its shortlisted movies back out of it."""
        if self._stacked is not None:
            return self._stacked
        if not self.clip_ids:
            # multi-host: a rank may legitimately hold an empty library
            # shard (more processes than movies) — it must still reach the
            # control-plane gathers with an empty contribution, or every
            # peer blocks in the rendezvous for the full KV timeout
            assert jax.process_count() > 1, \
                "corpus is empty — add_video() first"
            self._stacked = {}
            return self._stacked
        by_bucket: Dict[int, List[str]] = {}
        for cid in self.clip_ids:
            l_pad = self.pipe._device_video(cid)[0].shape[0]
            by_bucket.setdefault(l_pad, []).append(cid)
        stacked = {}
        for l_pad, ids in sorted(by_bucket.items()):
            vids = [self.pipe._device_video(c) for c in ids]
            if self.mesh is not None:
                # pad V to the mesh size so the movie axis shards evenly;
                # padded rows repeat movie 0 and are dropped at unzip time
                # (ids/ctxs keep the true length)
                n_dev = int(np.prod([self.mesh.shape[a]
                                     for a in self.mesh.axis_names]))
                vids = vids + [vids[0]] * ((-len(ids)) % n_dev)
            A = jnp.stack([v[0] for v in vids])
            S = jnp.stack([v[1] for v in vids])
            if any(v[2] is not v[0] for v in vids):  # dual-stream corpus
                M = jnp.stack([v[2] for v in vids])
                MS = jnp.stack([v[3] for v in vids])
            else:
                M, MS = None, None
            ctx = jnp.asarray([v[4] for v in vids], jnp.int32)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                vsh = NamedSharding(self.mesh, P("dp"))
                A = jax.device_put(A, vsh)
                S = jax.device_put(S, vsh)
                ctx = jax.device_put(ctx, vsh)
                if M is not None:
                    M = jax.device_put(M, vsh)
                    MS = jax.device_put(MS, vsh)
            ctxs = [v[4] for v in vids[: len(ids)]]
            stacked[l_pad] = (ids, A, S, M, MS, ctx, ctxs)
        self.pipe._dev_cache = {}
        self._stacked = stacked
        return stacked

    def _video_arrays(self, clip_id: str):
        """(appear, a_scale, motion, m_scale, ctx_l) for one movie, sliced
        out of the resident stack (transient device copy, freed after the
        search)."""
        for ids, A, S, M, MS, _, ctxs in self._ensure_stacked().values():
            if clip_id in ids:
                i = ids.index(clip_id)
                a, s = A[i], S[i]
                if M is None:
                    return a, s, a, s, ctxs[i]
                return a, s, M[i], MS[i], ctxs[i]
        raise KeyError(clip_id)

    def _coarse_all(self, cls_feats: np.ndarray):
        """(video_id, ctx_l, (Q, n_w) window scores) for every resident
        video: ONE dispatch per ctx bucket over the stacked corpus for the
        whole query batch, one batched fetch."""
        clss = np.asarray(cls_feats, np.float32)
        norms = np.maximum(np.linalg.norm(clss, axis=-1, keepdims=True), 1e-12)
        clss_j = jnp.asarray(clss / norms)
        pend = []
        for ids, A, S, _, _, ctx, ctxs in self._ensure_stacked().values():
            fut = self._stacked_scores(self.pipe.params, A, S, ctx, clss_j)
            pend.append((ids, ctxs, fut))
        fetched = jax.device_get([p[2] for p in pend])
        out = []
        for (ids, ctxs, _), scores in zip(pend, fetched):
            out.extend((cid, ctx_l, scores[i])
                       for i, (cid, ctx_l) in enumerate(zip(ids, ctxs)))
        return out

    def search(self, token_feats: np.ndarray, cls_feat: np.ndarray,
               query: str = "", search_windows: Optional[int] = None,
               top_moments: int = 10,
               adaptive_margin: Optional[float] = None) -> List[Dict]:
        """Rank moments for ONE query across the whole corpus (see
        search_batch). token_feats: (Lq, Dt); cls_feat: (Dt,)."""
        return self.search_batch(
            [token_feats], np.asarray(cls_feat, np.float32)[None],
            queries=[query], search_windows=search_windows,
            top_moments=top_moments, adaptive_margin=adaptive_margin,
        )[0]

    def search_batch(self, token_feats_list, cls_feats: np.ndarray,
                     queries: Optional[List[str]] = None,
                     search_windows: Optional[int] = None,
                     top_moments: int = 10,
                     adaptive_margin: Optional[float] = None) -> List[List[Dict]]:
        """Rank moments for a BATCH of queries across the whole corpus.

        All queries share the per-bucket coarse scans (the corpus HBM
        stream is paid once per batch, not per query), and the fine stage
        batches up to `fine_chunk` queries that shortlisted the same movie
        into one dispatch.

        Multi-host (jax.distributed initialized): each process holds its
        own library shard, scans and fine-runs only its own movies; the
        global window budget and the candidate rows merge over the
        coordination service (parallel/distributed.all_gather_obj), so
        every process returns the identical corpus-wide ranking and
        capacity scales linearly with hosts.

        Args:
            token_feats_list: Q arrays of (Lq_i, Dt) query token features.
            cls_feats: (Q, Dt) holistic query features.
            search_windows: corpus-wide window budget per query (default:
                data.topk_window, the per-video budget).
            top_moments: moments returned per query.
            adaptive_margin: optional per-query budget shrink — only
                windows with coarse score >= (query's best - margin)
                refine, so concentrated queries cost a fraction of the
                budget. None (default) keeps the fixed-budget semantics.

        Returns: per query, a list of dicts {video_id, span (st, ed),
        prop, match, fused}, fusion-ranked across videos.
        """
        nq = len(token_feats_list)
        queries = queries or [""] * nq
        k = self.cfg.data.topk_window if search_windows is None else search_windows
        kk = self.cfg.data.topk_window
        fc = self.fine_chunk
        clss = np.asarray(cls_feats, np.float32)
        clss = clss / np.maximum(
            np.linalg.norm(clss, axis=-1, keepdims=True), 1e-12)

        # stage 1: every bucket scanned once for the whole query batch
        scored = self._coarse_all(clss)

        # stage 2: per-query global top-k (video, window) merge, vectorized
        # (a Python loop over Q x total-windows tuples costs hundreds of ms
        # at MAD library scale)
        cols_scores, col_cid, col_w = [], [], []
        for cid, ctx_l, scores in scored:  # scores: (Q, n_w_padded)
            n_win = num_windows(ctx_l, self.pipe.stride)
            cols_scores.append(np.asarray(scores[:, :n_win]))
            col_cid.extend([cid] * n_win)
            col_w.extend(range(n_win))
        S = (np.concatenate(cols_scores, axis=1) if cols_scores
             else np.zeros((nq, 0), np.float32))  # (Q, W_total)
        col_w = np.asarray(col_w)
        col_cid_arr = np.asarray(col_cid)
        kth = min(k, S.shape[1])
        # deterministic local top-k under the (score desc, video, window)
        # TOTAL order — coarse scores tie exactly whenever 50%-overlapping
        # windows share their segment-max frame, so an argpartition-only
        # cut would pick arbitrary tie members and sharded vs unsharded
        # libraries would disagree. argpartition to a 4x margin first (tie
        # groups are O(overlap)≈2-3 wide; a group would need >3k members
        # to straddle the margin), then lexsort just the margin.
        local_sel: List[np.ndarray] = []
        for qi in range(nq):
            if kth:
                m = min(S.shape[1], max(4 * kth, kth + 64))
                part = (np.argpartition(-S[qi], m - 1)[:m]
                        if m < S.shape[1] else np.arange(S.shape[1]))
                order = part[np.lexsort(
                    (col_w[part], col_cid_arr[part], -S[qi, part]))]
                local_sel.append(order[:kth])
            else:
                local_sel.append(np.zeros(0, np.int64))
        # the (host-local) top-k is a SUPERSET of this process's
        # contribution to the global top-k; multi-host, the tiny
        # (score, video, window) triples merge over the control plane and
        # each process fine-runs only its own videos from the global
        # selection. Tie-break is (score desc, video, window) — the SAME
        # deterministic rule single- and multi-host (coarse scores tie
        # exactly when 50%-overlapping windows share their segment-max
        # frame, so an order-dependent tie-break would make sharded and
        # unsharded libraries disagree).
        payload = [[(float(S[qi, c]), col_cid[c], int(col_w[c]))
                    for c in local_sel[qi]] for qi in range(nq)]
        if jax.process_count() > 1:
            from cone_tpu.parallel.distributed import all_gather_obj

            gathered = all_gather_obj(payload, "corpus_topk")
        else:
            gathered = [payload]
        mine = set(self.clip_ids)
        chosen: List[Dict[str, List[int]]] = [dict() for _ in range(nq)]
        for qi in range(nq):
            merged = sorted((tuple(t) for g in gathered for t in g[qi]),
                            key=lambda t: (-t[0], t[1], t[2]))[:k]
            if adaptive_margin is not None and merged:
                # per-query adaptive budget: drop windows whose coarse score
                # trails the query's best by more than the margin. The fine
                # stage (>99.8% of per-query FLOPs) then scales with how
                # concentrated the coarse signal is instead of always
                # refining the full budget. Identical on every host (the cut
                # applies to the globally-merged list). Note the fusion
                # min-max then normalizes over the surviving candidate set —
                # an intentional semantic difference from the fixed-budget
                # reference scheme, opt-in per request.
                floor = merged[0][0] - adaptive_margin
                merged = [t for t in merged if t[0] >= floor]
            for _, cid, w in merged:
                if cid in mine:
                    chosen[qi].setdefault(cid, []).append(int(w))

        # stage 3: fine — queries that shortlisted the same movie batch
        # into one dispatch (fine_chunk lanes); all dispatches before the
        # one batched fetch
        toks_np = np.zeros((nq, self.cfg.data.max_q_l,
                            self.cfg.model.t_feat_dim), np.float32)
        tmask_np = np.zeros((nq, self.cfg.data.max_q_l), np.float32)
        for qi, tok in enumerate(token_feats_list):
            n_tok = min(len(tok), self.cfg.data.max_q_l)
            toks_np[qi, :n_tok] = tok[:n_tok]
            tmask_np[qi, :n_tok] = 1

        # a (query, video) pair whose shortlist exceeds the fine program's
        # window axis (kk lanes) dispatches as multiple rows, so the full
        # `search_windows` budget is honored even when the coarse signal
        # concentrates every window in one movie
        by_movie: Dict[str, List[tuple]] = {}
        for qi, ch in enumerate(chosen):
            for cid, wins in ch.items():
                for s in range(0, len(wins), kk):
                    by_movie.setdefault(cid, []).append((qi, wins[s : s + kk]))
        fine_pend = []
        for cid, lst in by_movie.items():
            appear_j, a_scale, motion_j, m_scale, ctx_l = (
                self._video_arrays(cid))
            for i in range(0, len(lst), fc):
                grp = lst[i : i + fc]
                win_idx = np.zeros((fc, kk), np.int32)
                toks = np.zeros((fc,) + toks_np.shape[1:], np.float32)
                tmask = np.zeros((fc,) + tmask_np.shape[1:], np.float32)
                cls_rows = np.zeros((fc, clss.shape[1]), np.float32)
                cls_rows[:, 0] = 1.0  # pad rows: unit vector, no 0/0
                for j, (qi, wins) in enumerate(grp):
                    win_idx[j, : len(wins)] = wins[:kk]
                    toks[j], tmask[j] = toks_np[qi], tmask_np[qi]
                    cls_rows[j] = clss[qi]
                fut = self.pipe._fine_fn(
                    self.pipe.params, appear_j, a_scale, motion_j, m_scale,
                    jnp.asarray(ctx_l), jnp.asarray(win_idx),
                    jnp.asarray(toks), jnp.asarray(tmask),
                    jnp.asarray(cls_rows),
                )
                fine_pend.append((cid, grp, fut))
        fine_res = jax.device_get([f[2] for f in fine_pend])

        # stage 4: reference-semantics post-processing, per query
        rows: List[List[list]] = [[] for _ in range(nq)]
        for (cid, grp, _), got in zip(fine_pend, fine_res):
            spans_sec, prob, match = got[0], got[1], got[2]
            for j, (qi, wins) in enumerate(grp):
                for w in range(len(wins)):
                    for p in range(prob.shape[2]):
                        rows[qi].append(
                            [cid, float(f"{spans_sec[j, w, p, 0]:.4f}"),
                             float(f"{spans_sec[j, w, p, 1]:.4f}"),
                             float(f"{prob[j, w, p]:.4f}"),
                             float(f"{match[j, w, p]:.4f}")])
        if jax.process_count() > 1:
            # merge candidate rows across hosts BEFORE fusion: min-max
            # normalization must see the query's full corpus-wide candidate
            # set or per-host fused scores wouldn't be comparable
            from cone_tpu.parallel.distributed import all_gather_obj

            parts = all_gather_obj(rows, "corpus_rows")
            rows = [sum((g[qi] for g in parts), []) for qi in range(nq)]
        return [
            self._postprocess(rows[qi], queries[qi], top_moments)
            for qi in range(nq)
        ]

    def _postprocess(self, rows, query: str, top_moments: int) -> List[Dict]:
        """Min-max fusion over one query's corpus-wide candidate set, NMS
        within each video, one global fusion ranking (the per-video
        pipeline's reference semantics extended across videos)."""
        if not rows:
            return []
        prop_n = min_max_normalize([r[3] for r in rows])
        match_n = min_max_normalize([r[4] for r in rows])
        fused = [p + m for p, m in zip(prop_n, match_n)]

        by_vid: Dict[str, List] = {}
        for r, f in zip(rows, fused):
            by_vid.setdefault(r[0], []).append([r[1], r[2], f, r[3], r[4]])
        out = []
        for cid, moments in by_vid.items():
            moments.sort(key=lambda m: -m[2])
            kept = temporal_nms_host(
                [m[:3] for m in moments][: self.cfg.eval.max_before_nms],
                self.cfg.eval.nms_thd, top_moments,
                hull_union=self.pipe.nms_hull,
            )
            scores = {(m[0], m[1]): (m[3], m[4], m[2]) for m in moments}
            for st, ed, f in kept:
                pr, ma, fu = scores[(st, ed)]
                out.append(dict(video_id=cid, span=(st, ed), prop=pr,
                                match=ma, fused=fu, query=query))
        out.sort(key=lambda d: -d["fused"])
        return out[:top_moments]
