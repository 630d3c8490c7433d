"""Full hybrid search service — reference entry point A parity.

Mirrors ``perform_search`` (src/lean_explore/local/search.py:340-791;
service wrapper local/service.py:293-341) stage for stage:

1. embed query (pluggable; the real SentenceTransformer is out of
   scope — G3 in SURVEY.md §2.8 — so the default embedder is a
   deterministic stub mapping the query into the corpus embedding
   space);
2. candidate generation: cosine top-``faiss_k`` over the embeddings
   table, ×3 oversampling when a filter is active (reference
   defaults.py:101-103).  Default ``embedding_mode="spark"`` scores
   the embeddings TABLE per query (Arrow-batched numpy dots, TakeOrdered
   top-k — no O(corpus) driver matrix, the r1 VERDICT scale-killer);
   ``ann_tables > 0`` prunes the scan to the query's LSH buckets first
   (the IVF-nprobe analog, multi-table OR).  ``embedding_mode="driver"``
   preloads the matrix into driver numpy — the low-latency option for
   corpora that fit, matching the reference preloading its FAISS index;
3. similarity threshold ≥ 0.525 (defaults.py:106);
4. doc fetch + filter (lang filter = the reference's package-prefix
   filter, search.py:541-551) — joined inside the candidate plan in
   spark mode, never a corpus-wide driver dict;
5. BM25Plus lexical scores for the CANDIDATE SET ONLY
   (SearchEngine.score_candidates: postings pruned to query terms,
   blocks pruned to candidate ids — bit-identical to the full-corpus
   scorer on those docs, reference search.py:670-678 semantics);
6. min-max normalize 3 signals + weighted combine
   (query/hybrid.py, exact reference semantics);
7. sort (final desc, doc_id asc), limit (defaults limit 50).
"""

from __future__ import annotations


from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lean_explore_spark.operators import similarity as sim_ops
from lean_explore_spark.query import hybrid
from lean_explore_spark.query.search import SearchEngine

DEFAULT_FAISS_K = 100
DEFAULT_SIM_THRESHOLD = 0.525
DEFAULT_LIMIT = 50
OVERSAMPLE = 3


@dataclass
class SearchResult:
    doc_id: int
    final_score: float
    raw_similarity: float
    norm_similarity: float
    pagerank: float
    norm_pagerank: float
    raw_bm25: float
    norm_bm25: float


def stub_embedder(dim: int):
    """Deterministic query embedder (G3 stand-in): the same md5-integer
    unit-vector kernel documents are embedded with (operators.embed) —
    stable across processes, partitionings, and engines."""
    from lean_explore_spark.operators.embed import md5_unit_vector

    def embed(query: str) -> np.ndarray:
        return md5_unit_vector(query, dim)

    return embed


class SearchService:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        embeddings: DataFrame,
        doc_meta: Optional[DataFrame] = None,
        pagerank: Optional[Dict[int, float]] = None,
        embedder: Optional[Callable[[str], np.ndarray]] = None,
        w_semantic: float = hybrid.DEFAULT_W_SEMANTIC,
        w_pagerank: float = hybrid.DEFAULT_W_PAGERANK,
        w_bm25: float = hybrid.DEFAULT_W_BM25,
        embedding_mode: str = "spark",
        ann_tables: int = 0,
        preload: bool = True,
        lang_cache_size: int = 100_000,
    ) -> None:
        """``preload=True`` pins dictionary+postings in driver memory
        (the reference preloads its assets before serving; right for
        latency-critical corpora that fit).  ``preload=False`` is the
        COLD/at-scale mode (r2 VERDICT #3): every lookup is a pruned
        Spark read (bucket partition pruning + term pushdown), nothing
        corpus-sized ever lands on the driver."""
        if embedding_mode not in ("spark", "driver"):
            raise ValueError(f"unknown embedding_mode {embedding_mode!r}")
        from collections import OrderedDict

        self.spark = spark
        self.engine = SearchEngine(spark, index_dir, preload=preload)
        self.mode = embedding_mode
        self.ann_tables = ann_tables
        # spark mode fills this lazily per candidate batch; LRU-bound
        # so a long-running service never accumulates an unbounded
        # doc_id→lang map (r4 VERDICT #3 — same class as the engine's
        # cold-mode _dl_cache).  Driver mode preloads the full map by
        # design (the reference preloads its assets) and skips the
        # bound, like SearchEngine preload mode.
        self._lang: "OrderedDict[int, str]" = OrderedDict()
        self._lang_bound = lang_cache_size
        if embedding_mode == "driver":
            rows = embeddings.select("vec_id", "embedding").collect()
            self._emb_ids = np.array(
                [r["vec_id"] for r in rows], dtype=np.int64
            )
            self._emb = np.array(
                [r["embedding"] for r in rows], dtype=np.float64
            )
            self._emb_norm = self._emb / np.linalg.norm(
                self._emb, axis=1, keepdims=True
            )
            dim = self._emb.shape[1]
            if doc_meta is not None:
                for r in doc_meta.select("doc_id", "lang").collect():
                    self._lang[int(r["doc_id"])] = r["lang"]
        else:
            self._embeddings = embeddings.select("vec_id", "embedding")
            self._doc_meta = doc_meta
            dim = len(embeddings.select("embedding").head()["embedding"])
            # lang lookups are joined per candidate batch; the dict
            # fills lazily with candidates actually seen (bounded by
            # queries·k, not by the corpus)
            if ann_tables > 0:
                # Build the LSH bucket tables ONCE and pin them
                # (MEMORY_AND_DISK): this is ANN *index load* — the
                # FAISS-analog asset a serving process opens before
                # taking traffic (same class as preload=True pinning
                # postings).  Before r6 every query re-derived the
                # (table, bucket, vec_id) relation from the raw
                # embedding table — 8 tables × corpus plane-dots per
                # query, measured 21.9 s/query at 400k vs 0.9 s for
                # the UNpruned scan the prefilter is meant to beat.
                # Persisted, the probe is a bucket-key join against a
                # memory-resident relation.  Lives for the service
                # lifetime by design; at real scale this relation is
                # the G4 ANN index written as bucketed parquet.
                from pyspark import StorageLevel

                self._lsh_tables = sim_ops.rp_lsh_tables(
                    self._embeddings, n_tables=ann_tables
                ).persist(StorageLevel.MEMORY_AND_DISK)
                self._lsh_tables.count()  # materialize at open, not
                # on the first query's tail latency
        self.pagerank = pagerank or {}
        self.embed = embedder or stub_embedder(dim)
        self.weights = (w_semantic, w_pagerank, w_bm25)

    # -- stages -----------------------------------------------------------

    def _candidates_driver(
        self, qvec: np.ndarray, k: int
    ) -> List[tuple]:
        sims = self._emb_norm @ (qvec / np.linalg.norm(qvec))
        order = np.lexsort((self._emb_ids, -sims))[:k]
        return [(int(self._emb_ids[i]), float(sims[i])) for i in order]

    def _candidates_spark(self, qvec: np.ndarray, k: int) -> List[tuple]:
        """Top-k cosine over the embeddings TABLE: Arrow-batched numpy
        dots per partition + TakeOrdered — the driver sees k rows, not
        the matrix.  With ``ann_tables`` set, the scan is first pruned
        to rows sharing one of the query's LSH buckets (candidate
        recall per rp_lsh_tables docs)."""
        qunit = np.asarray(qvec, dtype=np.float64)
        qunit = qunit / np.linalg.norm(qunit)

        emb = self._embeddings
        if self.ann_tables > 0:
            probes = [
                (t, sim_ops.lsh_bucket_of(qunit, table=t))
                for t in range(self.ann_tables)
            ]
            tb = self._lsh_tables  # pinned at init (ANN index load)
            probe_df = tb.sparkSession.createDataFrame(
                probes, "table int, bucket long"
            )
            cand_ids = (
                tb.join(F.broadcast(probe_df), ["table", "bucket"])
                .select("vec_id")
                .distinct()
            )
            emb = emb.join(cand_ids, "vec_id")

        def score(it):
            import numpy as _np
            import pandas as _pd

            for pdf in it:
                if not len(pdf):
                    continue
                mat = _np.array(list(pdf["embedding"]), dtype=_np.float64)
                norms = _np.linalg.norm(mat, axis=1, keepdims=True)
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "sim": (mat / norms) @ qunit,
                    }
                )

        top = (
            emb.mapInPandas(score, "vec_id long, sim double")
            .orderBy(F.desc("sim"), F.asc("vec_id"))
            .limit(k)
        )
        rows = top.collect()
        if self._doc_meta is not None and rows:
            # lang fetch is a SEPARATE broadcast-semi lookup (ADVICE
            # r2): candidate membership comes from `rows` alone and
            # never depends on doc_meta coverage — an id absent from
            # doc_meta keeps its slot with lang=None, like driver mode.
            ids = self.spark.createDataFrame(
                [(int(r["vec_id"]),) for r in rows], "vec_id long"
            )
            meta = self._doc_meta.select(
                F.col("doc_id").alias("vec_id"), "lang"
            )
            for r in meta.join(F.broadcast(ids), "vec_id").collect():
                self._lang[int(r["vec_id"])] = r["lang"]
                self._lang.move_to_end(int(r["vec_id"]))
            # never evict the batch just fetched — the caller filters
            # THIS query's candidates against it right after
            while len(self._lang) > max(self._lang_bound, len(rows)):
                self._lang.popitem(last=False)
        out = [(int(r["vec_id"]), float(r["sim"])) for r in rows]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    def _candidates(
        self, qvec: np.ndarray, faiss_k: int, oversample: bool
    ) -> List[tuple]:
        k = faiss_k * (OVERSAMPLE if oversample else 1)
        if self.mode == "driver":
            return self._candidates_driver(qvec, k)
        return self._candidates_spark(qvec, k)

    def _batch_candidates_spark(
        self, qvecs: List[np.ndarray], k: int
    ) -> List[List[tuple]]:
        """Candidate top-k for Q queries in ONE Spark job (r5 VERDICT
        #1: per-query spark mode paid ~2 scheduled jobs per query, so
        an evaluation sweep cost O(Q) fixed scheduling — the same cost
        the r5 lexical batching removed at 23×).

        Bit-identity with the per-query path: each partition chunk
        computes the SAME ``(mat/norms) @ qunit`` matvec per query
        (never one Q-wide GEMM, whose BLAS kernel could differ in the
        last ulp), keeps a per-chunk top-k superset with the same
        (sim desc, vec_id asc) order, and a per-query row_number
        window applies the identical global cut — asserted bit-exact
        against ``search()`` in tests/test_service.py.

        With ``ann_tables`` the scan is pruned per query via one
        broadcast (qid, table, bucket) probe join — the same buckets
        each per-query call would probe.  Driver traffic is O(Q·k)
        candidate rows plus one lang-meta lookup for the union.
        """
        qmat = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                / np.linalg.norm(np.asarray(v, dtype=np.float64))
                for v in qvecs
            ]
        )
        nq = qmat.shape[0]
        emb = self._embeddings
        kk = k

        if self.ann_tables > 0:
            probes = [
                (qi, t, sim_ops.lsh_bucket_of(qmat[qi], table=t))
                for qi in range(nq)
                for t in range(self.ann_tables)
            ]
            tb = self._lsh_tables  # pinned at init (ANN index load)
            probe_df = tb.sparkSession.createDataFrame(
                probes, "qid int, table int, bucket long"
            )
            pairs = (
                tb.join(F.broadcast(probe_df), ["table", "bucket"])
                .select("qid", "vec_id")
                .distinct()
                .join(emb, "vec_id")
            )

            def score_pairs(it):
                import numpy as _np
                import pandas as _pd

                for pdf in it:
                    if not len(pdf):
                        continue
                    mat = _np.array(list(pdf["embedding"]), dtype=_np.float64)
                    unit = mat / _np.linalg.norm(mat, axis=1, keepdims=True)
                    qids = pdf["qid"].to_numpy()
                    sims = _np.empty(len(pdf), dtype=_np.float64)
                    for qi in _np.unique(qids):
                        m = qids == qi
                        # same matvec shape as the per-query kernel
                        sims[m] = unit[m] @ qmat[qi]
                    yield _pd.DataFrame(
                        {
                            "qid": qids,
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "sim": sims,
                        }
                    )

            scored = pairs.mapInPandas(
                score_pairs, "qid int, vec_id long, sim double"
            )
        else:

            def score_all(it):
                import numpy as _np
                import pandas as _pd

                for pdf in it:
                    if not len(pdf):
                        continue
                    mat = _np.array(list(pdf["embedding"]), dtype=_np.float64)
                    unit = mat / _np.linalg.norm(mat, axis=1, keepdims=True)
                    vec_ids = pdf["vec_id"].to_numpy()
                    frames = []
                    for qi in range(nq):
                        sims = unit @ qmat[qi]  # identical per-query matvec
                        if len(sims) > kk:
                            # local top-k superset, same tie-break as
                            # the global cut (sim desc, vec_id asc)
                            sel = _np.lexsort((vec_ids, -sims))[:kk]
                        else:
                            sel = _np.arange(len(sims))
                        frames.append(
                            _pd.DataFrame(
                                {
                                    "qid": _np.full(len(sel), qi, dtype=_np.int32),
                                    "vec_id": vec_ids[sel],
                                    "sim": sims[sel],
                                }
                            )
                        )
                    yield _pd.concat(frames, ignore_index=True)

            scored = emb.mapInPandas(
                score_all, "qid int, vec_id long, sim double"
            )

        from pyspark.sql.window import Window

        w = Window.partitionBy("qid").orderBy(
            F.desc("sim"), F.asc("vec_id")
        )
        rows = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= kk)
            .select("qid", "vec_id", "sim")
            .collect()
        )
        assert len(rows) <= kk * nq  # O(Q·k) driver rows
        out: List[List[tuple]] = [[] for _ in range(nq)]
        for r in rows:
            out[r["qid"]].append((int(r["vec_id"]), float(r["sim"])))
        for lst in out:
            lst.sort(key=lambda t: (-t[1], t[0]))
        if self._doc_meta is not None and rows:
            # ONE lang lookup for the union of all queries' candidates
            # (the per-query path pays one broadcast-semi job each)
            ids = sorted({int(r["vec_id"]) for r in rows})
            ids_df = self.spark.createDataFrame(
                [(i,) for i in ids], "vec_id long"
            )
            meta = self._doc_meta.select(
                F.col("doc_id").alias("vec_id"), "lang"
            )
            for r in meta.join(F.broadcast(ids_df), "vec_id").collect():
                self._lang[int(r["vec_id"])] = r["lang"]
                self._lang.move_to_end(int(r["vec_id"]))
            while len(self._lang) > max(self._lang_bound, len(ids)):
                self._lang.popitem(last=False)
        return out

    def batch_search(
        self,
        queries: Sequence[str],
        limit: int = DEFAULT_LIMIT,
        lang_filter: Optional[Sequence[str]] = None,
        faiss_k: int = DEFAULT_FAISS_K,
        sim_threshold: float = DEFAULT_SIM_THRESHOLD,
        log_path: Optional[str] = None,
        distributed: bool = False,
    ) -> List[List[SearchResult]]:
        """Batch query API (reference local/service.py:331-341): N
        queries, result lists in input order.  Each query runs the full
        hybrid pipeline; per-query assets (dictionary slices, postings)
        are shared through the engine's caches.

        ``distributed=True`` (spark embedding mode only, r5 VERDICT
        #1): candidate generation + the lang-meta lookup for ALL
        queries run in ~2 Spark jobs TOTAL instead of ~2 per query —
        the offline-sweep path where per-query job scheduling
        dominates (same fixed cost the r5 lexical batching removed at
        23×).  Results are bit-identical to the per-query path
        (asserted in tests/test_service.py); the remaining stages
        (threshold, lang filter, candidate BM25, combine) are the
        SAME ``_finish`` code.  With a preloaded engine the BM25
        stage is driver-side, so the whole sweep stays at ~2 jobs; a
        cold engine still pays its per-query pruned postings reads."""
        if distributed and self.mode == "spark":
            import time as _time

            t0 = _time.time()

            def _mklog(q):
                def _log(status: str, n: int):
                    if log_path:
                        from lean_explore_spark.query.perf_log import (
                            log_search_event,
                        )

                        # batched: elapsed is ms since batch start
                        # (per-query latency inside one job is
                        # meaningless)
                        log_search_event(
                            log_path,
                            status,
                            (_time.time() - t0) * 1000,
                            n,
                            q,
                        )

                return _log

            live = [
                (i, q) for i, q in enumerate(queries) if q and q.strip()
            ]
            out: List[List[SearchResult]] = [[] for _ in queries]
            for i, q in enumerate(queries):
                if not (q and q.strip()):
                    _mklog(q)("EMPTY_QUERY", 0)
            if live:
                k = faiss_k * (OVERSAMPLE if lang_filter else 1)
                cand_lists = self._batch_candidates_spark(
                    [self.embed(q) for _, q in live], k
                )
                for (i, q), cands in zip(live, cand_lists):
                    out[i] = self._finish(
                        q,
                        cands,
                        limit,
                        lang_filter,
                        faiss_k,
                        sim_threshold,
                        _mklog(q),
                    )
            return out
        return [
            self.search(
                q,
                limit=limit,
                lang_filter=lang_filter,
                faiss_k=faiss_k,
                sim_threshold=sim_threshold,
                log_path=log_path,
            )
            for q in queries
        ]

    def batch_lexical_search(
        self,
        queries: Sequence[str],
        k: int = DEFAULT_LIMIT,
        distributed: bool = False,
    ) -> List[List[tuple]]:
        """Batch BM25 top-k, result lists in input order.  With
        ``distributed=True`` all queries run in ONE Spark job
        (engine.search_tokens_distributed_batch, r5) — the offline-
        evaluation path where per-query job scheduling (~0.5 s each)
        would otherwise dominate the sweep."""
        token_lists = [self.engine.analyze_query(q) for q in queries]
        if distributed:
            return self.engine.search_tokens_distributed_batch(
                token_lists, k
            )
        return [self.engine.search_tokens(t, k) for t in token_lists]

    def lexical_search(
        self,
        query: str,
        k: int = DEFAULT_LIMIT,
        distributed: bool = False,
        routed: bool = False,
    ) -> List[tuple]:
        """Pure BM25 top-k through the packed index (r2 VERDICT #3:
        the distributed path — one Spark task per doc-shard running
        block-max WAND, k-heap merge on the driver — is now reachable
        from the serving surface, not only from the engine).

        ``routed=True`` (r8) serves through the posting-mass router:
        light queries keep the sequential preloaded kernel, hot ones
        fan across the θ0-seeded fork pool — the interactive-serving
        default at large corpora (6.4M: p95 645→93 ms, BENCH §13b);
        results are bit-identical to both other paths."""
        tokens = self.engine.analyze_query(query)
        if distributed:
            return self.engine.search_tokens_distributed(tokens, k)
        if routed:
            return self.engine.search_tokens_routed(tokens, k)
        return self.engine.search_tokens(tokens, k)

    def search(
        self,
        query: str,
        limit: int = DEFAULT_LIMIT,
        lang_filter: Optional[Sequence[str]] = None,
        faiss_k: int = DEFAULT_FAISS_K,
        sim_threshold: float = DEFAULT_SIM_THRESHOLD,
        log_path: Optional[str] = None,
    ) -> List[SearchResult]:
        import time as _time

        t0 = _time.time()

        def _log(status: str, n: int):
            if log_path:
                from lean_explore_spark.query.perf_log import log_search_event

                log_search_event(
                    log_path, status, (_time.time() - t0) * 1000, n, query
                )

        if not query or not query.strip():
            _log("EMPTY_QUERY", 0)  # reference early-return (search.py:360-367)
            return []
        qvec = self.embed(query)
        cands = self._candidates(qvec, faiss_k, oversample=bool(lang_filter))
        return self._finish(
            query, cands, limit, lang_filter, faiss_k, sim_threshold, _log
        )

    def _finish(
        self,
        query: str,
        cands: List[tuple],
        limit: int,
        lang_filter: Optional[Sequence[str]],
        faiss_k: int,
        sim_threshold: float,
        _log,
    ) -> List[SearchResult]:
        """Post-candidate stages (threshold → lang filter → candidate
        BM25 → combine → sort/limit), shared verbatim by the per-query
        and batched paths so batching cannot drift semantically."""
        cands = [(d, s) for d, s in cands if s >= sim_threshold]
        if lang_filter:
            allowed = set(lang_filter)
            cands = [
                (d, s) for d, s in cands if self._lang.get(d) in allowed
            ][: faiss_k]
        if not cands:
            _log("NO_CANDIDATES_POST_THRESHOLD", 0)
            return []

        tokens = self.engine.analyze_query(query)
        doc_ids = [d for d, _ in cands]
        # candidate-set BM25 (bit-identical to full-corpus scores on
        # these docs); clamp negatives like the reference
        # (search.py:676-678) — BM25Plus is non-negative anyway, the
        # clamp is belt-and-braces
        bm25 = self.engine.score_candidates(tokens, doc_ids)
        sims = [s for _, s in cands]
        prs = [float(self.pagerank.get(d, 0.0)) for d in doc_ids]
        bms = [max(0.0, bm25.get(d, 0.0)) for d in doc_ids]

        combined = hybrid.combine(
            sims, prs, bms,
            w_semantic=self.weights[0],
            w_pagerank=self.weights[1],
            w_bm25=self.weights[2],
        )
        results = [
            SearchResult(
                doc_id=d,
                final_score=c.final_score,
                raw_similarity=s,
                norm_similarity=c.norm_similarity,
                pagerank=p,
                norm_pagerank=c.norm_pagerank,
                raw_bm25=b,
                norm_bm25=c.norm_bm25,
            )
            for d, s, p, b, c in zip(doc_ids, sims, prs, bms, combined)
        ]
        results.sort(key=lambda r: (-r.final_score, r.doc_id))
        out = results[:limit]
        _log("SUCCESS", len(out))
        return out
