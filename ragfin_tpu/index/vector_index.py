"""HBM-resident packed vector index with exact cosine top-k search.

TPU-native replacement for the reference's Milvus collection ``fin_chunks``
(``chunking_storing (1).py:14-29,377-397``): the embedding matrix lives packed
and L2-normalized in device HBM; the sidecar metadata table (id, text, period,
chunk_type, statement_type, primary_value — same fields as the Milvus schema)
stays on host. Search is exact flat cosine (:mod:`ragfin_tpu.ops.topk`),
which strictly dominates the reference's IVF_FLAT on recall at equal memory.

Persistence replaces Milvus flush/load: ``save``/``load`` round-trip the
packed matrix + metadata + featurizer stats to an ``.npz`` + JSON pair
(SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config.constants import DEFAULT_COLLECTION, EMBED_DIM
from ..data.models import IndexedChunk
from ..models.bag_encoder import BagEncoder, l2_normalize
from ..models.featurizer import HashedFeaturizer
from ..ops.topk import cosine_topk


def _q_bucket(n: int) -> int:
    """Bucket a query count to a small fixed set of device batch shapes.

    Every distinct Q reaching a kernel is a separate XLA executable, and a
    compile through the axon tunnel costs seconds-to-minutes: under the
    serving batcher, concurrent load produced batches of 3, 5, 13, 16, 20
    queries — a compile storm that collapsed the 1M concurrent benchmark to
    ~1 QPS with 20 s latencies. Padding Q to {1, 8, 64, k*64} bounds the
    executable count per tier-plan to ~3 warmable shapes; the padded zero
    rows cost ~nothing (the [Q, N] scan is corpus-bound) and are ignored by
    the host postprocess, which iterates the real query list.
    """
    if n <= 1:
        return 1
    if n <= 8:
        return 8
    if n <= 64:
        return 64
    return -(-n // 64) * 64


def _pad_queries(q) -> "np.ndarray":
    """Zero-pad [Q, D] query embeddings up to the Q bucket."""
    q = np.asarray(q, np.float32)
    b = _q_bucket(q.shape[0])
    if b == q.shape[0]:
        return q
    return np.concatenate([q, np.zeros((b - q.shape[0], q.shape[1]), np.float32)])


def _repair_width(k: int) -> int:
    """Device shortlist width for the int8 exact repair.

    Measured (`int8_quality` probes, pessimistic random corpora, 1M AND
    10M): every true top-10 member sits within the int8 tier's top-16, so
    repairing a 16-wide shortlist restores recall@10 = 1.0000 exactly as
    the original top-64 repair did — and XLA's sort-based top_k over
    [Q, N] rows is the dominant serving cost of widening (top_k(64) cost
    ~+40 ms/query at 1M vs top_k(3)). +6 keeps the same measured slack
    (16 - 10) for larger k.
    """
    return max(k + 6, 16)


def _oracle_truncate(exact, ids, k: int):
    """Top ``k`` of exact scores with the oracle tie-break (stable
    score-descending, lowest global id wins) — the ONE implementation both
    int8 repair paths share, so ties can never diverge between them."""
    by_id = np.argsort(ids, axis=1, kind="stable")
    ids_s = np.take_along_axis(ids, by_id, axis=1)
    ex_s = np.take_along_axis(exact, by_id, axis=1)
    order = np.argsort(-ex_s, axis=1, kind="stable")[:, :k]
    return (
        np.take_along_axis(ex_s, order, axis=1),
        np.take_along_axis(ids_s, order, axis=1),
    )


def _exact_rerank_host(q, ids, rows_f32, k: int):
    """Exact f32 re-score of an int8 shortlist against host corpus rows.

    The repair runs on HOST on purpose: a device gather of Q*16 columns
    from a [384, 10M] HBM table costs tens of ms (TPU gathers are
    pathological — CLAUDE.md), while the same fancy-index over a host f32
    row matrix is a few ms and costs ZERO HBM (the int8 tier keeps its
    full capacity win). Returns the top ``k`` by exact score with the
    oracle tie-break.
    """
    ids = np.asarray(ids)
    qn, kr = ids.shape
    q = np.asarray(q, np.float32)
    # Sentinel insurance: kernel slots beyond n_valid carry INT32_MAX ids;
    # clip for the fancy-index and pin their exact score to -inf so they
    # sort last (mirrors _exact_repair's validity mask).
    n_rows = rows_f32.shape[0]
    safe = np.clip(ids, 0, max(n_rows - 1, 0))
    cand = rows_f32[safe.reshape(-1)].reshape(qn, kr, -1)
    exact = np.einsum("qd,qkd->qk", q, cand)
    exact = np.where(ids < n_rows, exact, -np.inf)
    return _oracle_truncate(exact, ids, k)


class SearchHit:
    """One search result row (Milvus hit parity: score + entity fields)."""

    __slots__ = ("score", "record", "rank", "conflict")

    def __init__(self, score: float, record: IndexedChunk, rank: int):
        self.score = score
        self.record = record
        self.rank = rank
        # Set by conflict detection (retrieval/conflict.py) when this hit's
        # (company, period, chunk_type) scope holds mutually-contradictory
        # figure sets in the shortlist; None = not analyzed.
        self.conflict = None

    @property
    def id(self) -> str:
        return self.record.id

    def to_dict(self, include_text: bool = True) -> dict:
        out = {
            "id": self.record.id,
            "score": self.score,
            "period": self.record.period,
            "chunk_type": self.record.chunk_type,
            "statement_type": self.record.statement_type,
            "primary_value": self.record.primary_value,
        }
        if include_text:
            out["text"] = self.record.text
        if self.conflict is not None:
            out["conflict"] = self.conflict
        return out


class DeviceVectorIndex:
    """Packed [N, D] unit-norm embedding matrix + host metadata sidecar."""

    # Accepts metadata-filter kwargs (periods/chunk_type/company/predicate/
    # rerank) in search_texts — the capability FilteredSearch requires.
    supports_filters = True

    @property
    def dtype(self):
        return self.matrix_t.dtype

    def __init__(
        self,
        embeddings: np.ndarray | jax.Array,
        records: Sequence[IndexedChunk],
        name: str = DEFAULT_COLLECTION,
        pad_multiple: int = 2048,
        dtype: jnp.dtype = jnp.float32,
        normalize: bool = True,
        int8_shadow: bool = True,
        host_quantize: Optional[bool] = None,
    ):
        quantized = str(dtype) in ("int8", "jnp.int8") or dtype == jnp.int8
        # Large int8 builds prep on HOST: the device path stages the full
        # f32 [D, N] (15.4 GB at 10M — over HBM) before quantizing, while
        # the host path transfers only the int8 matrix + scales (4x less).
        # numpy mirrors the device math op-for-op (np.rint and jnp.round
        # are both half-to-even; all arithmetic pinned to f32), tested
        # bitwise-equal against the device path (tests/test_topk.py).
        if host_quantize is None:
            host_quantize = (
                quantized
                and isinstance(embeddings, np.ndarray)
                and embeddings.nbytes > (4 << 30)
            )
        if host_quantize and quantized and isinstance(embeddings, np.ndarray):
            self._init_host_quantized(
                embeddings, records, name, pad_multiple, normalize, int8_shadow
            )
            return
        embeddings = jnp.asarray(embeddings, dtype=jnp.float32)
        if embeddings.ndim != 2:
            raise ValueError("embeddings must be [N, D]")
        if embeddings.shape[0] != len(records):
            raise ValueError("embeddings/records length mismatch")
        if normalize:
            embeddings = l2_normalize(embeddings)
        self.n = embeddings.shape[0]
        self.dim = embeddings.shape[1]
        pad = -self.n % pad_multiple if self.n else pad_multiple
        if pad:
            embeddings = jnp.pad(embeddings, ((0, pad), (0, 0)))
        # Stored TRANSPOSED [D, N_padded]: the layout the MXU wants for
        # q @ corpus_t, so no search kernel pays a relayout (ops/topk.py).
        # dtype "int8" stores a per-chunk absmax-quantized corpus (4x less
        # HBM traffic, ops/quantize.py) searched by the int8 fused kernel.
        self.quantized = str(dtype) in ("int8", "jnp.int8") or dtype == jnp.int8
        if self.quantized:
            from ..ops.quantize import quantize_corpus_t

            self.matrix_t, self.scales = quantize_corpus_t(jnp.asarray(embeddings.T))
            # Exact-rerank rows (round-3 verdict #4): the int8 tier's id
            # agreement with the f32 oracle is 0.972@10 at 1M AND 10M on
            # the pessimistic random corpus (probes int8_quality_{1m,10m})
            # because top-10 margins there sit inside the per-element
            # rounding. Scanning stays int8 (the 2x HBM-bandwidth win); the
            # final top-64 is re-scored exactly against HOST f32 rows —
            # measured repair to recall@10 = 1.000, zero HBM cost, and a
            # few host ms (a DEVICE gather of the same columns costs
            # 33-52 ms — TPU gather pathology). int8_shadow=False drops the
            # host copy (1.5 GB/1M rows) and the repair with it.
            self._exact_rows = (
                np.asarray(embeddings[: self.n], np.float32) if int8_shadow else None
            )
        else:
            self.matrix_t = jnp.asarray(embeddings.T, dtype=dtype)
            self.scales = None
            self._exact_rows = None
        self.records: list[IndexedChunk] = list(records)
        self._by_id = {r.id: i for i, r in enumerate(self.records)}
        self.name = name
        # Query-encoding backends; populated by build()/load() or assignable.
        # Initialized here so a directly-constructed index fails search_texts
        # with a clear "no embedder attached" instead of AttributeError.
        self.embedder = None
        self.featurizer = None
        self.encoder = None

    def _init_host_quantized(
        self,
        embeddings: np.ndarray,
        records: Sequence[IndexedChunk],
        name: str,
        pad_multiple: int,
        normalize: bool,
        int8_shadow: bool,
    ) -> None:
        """Host-side normalize + pad + int8 quantize (numpy), device transfer
        of ONLY the int8 matrix + scales. Mirrors the device path op-for-op
        in f32; `_exact_rows` (the repair/oracle basis) is the same
        host-normalized f32 rows either way."""
        if embeddings.ndim != 2:
            raise ValueError("embeddings must be [N, D]")
        if embeddings.shape[0] != len(records):
            raise ValueError("embeddings/records length mismatch")
        x = np.asarray(embeddings, np.float32)
        if normalize:
            nrm = np.sqrt(np.einsum("nd,nd->n", x, x, dtype=np.float32))
            x = x / np.maximum(nrm, np.float32(1e-12))[:, None]
        self.n, self.dim = x.shape
        pad = -self.n % pad_multiple if self.n else pad_multiple
        if pad:
            x = np.pad(x, ((0, pad), (0, 0)))
        self.quantized = True
        absmax = np.max(np.abs(x), axis=1) if x.size else np.zeros(x.shape[0], np.float32)
        scale = np.maximum(absmax, np.float32(1e-12)) / np.float32(127.0)
        q = np.clip(np.rint(x / scale[:, None]), -127, 127).astype(np.int8)
        self.matrix_t = jnp.asarray(np.ascontiguousarray(q.T))
        self.scales = jnp.asarray(scale.reshape(1, -1).astype(np.float32))
        self._exact_rows = x[: self.n] if int8_shadow else None
        self.records = list(records)
        self._by_id = {r.id: i for i, r in enumerate(self.records)}
        self.name = name
        self.embedder = None
        self.featurizer = None
        self.encoder = None

    # --- build -----------------------------------------------------------
    @classmethod
    def build(
        cls,
        chunks: Sequence[IndexedChunk],
        encoder: Optional[BagEncoder] = None,
        featurizer: Optional[HashedFeaturizer] = None,
        embedder=None,
        batch_size: int = 1024,
        **kwargs,
    ) -> "DeviceVectorIndex":
        """Embed chunk texts and pack the matrix (reference build pipeline
        ``chunking_storing (1).py:377-397``, with encode on-device).

        ``embedder`` (ragfin_tpu.models.embedder) selects the backend —
        hashed lexical (default) or the MiniLM transformer; the legacy
        encoder/featurizer pair is kept for direct control of the hashed
        path."""
        texts = [c.text for c in chunks]
        if embedder is None:
            from ..models.embedder import HashedEmbedder

            encoder = encoder or BagEncoder()
            featurizer = featurizer or HashedFeaturizer(vocab_size=encoder.vocab_size)
            embedder = HashedEmbedder(featurizer=featurizer, encoder=encoder)
        featurizer_docs = getattr(getattr(embedder, "featurizer", None), "n_docs", None)
        if featurizer_docs is None or featurizer_docs == 0:
            embedder.fit(texts)
        embs = []
        for start in range(0, len(texts), batch_size):
            embs.append(embedder.encode_texts(texts[start : start + batch_size]))
        matrix = np.concatenate(embs, axis=0) if embs else np.zeros((0, EMBED_DIM), np.float32)
        index = cls(matrix, chunks, **kwargs)
        index.embedder = embedder
        index.encoder = getattr(embedder, "encoder", None)
        index.featurizer = getattr(embedder, "featurizer", None)
        return index

    # --- search ----------------------------------------------------------
    def search_embeddings(
        self, query_embeddings: jax.Array, top_k: int = 3, method: str = "auto"
    ) -> tuple[jax.Array, jax.Array]:
        """Raw device search: [Q, D] unit queries → (scores, row ids)."""
        k = min(top_k, max(self.n, 1))
        q = jnp.asarray(query_embeddings, jnp.float32)
        if self.quantized:
            from ..ops.topk import cosine_topk_fused_int8

            if self._exact_rows is None or self.n == 0:
                # No shadow (int8_shadow=False) or empty index: the repair
                # has nothing to fancy-index (an empty rows matrix would
                # raise where the raw tier gracefully returns sentinels).
                return cosine_topk_fused_int8(
                    q, self.matrix_t, self.scales, k, n_valid=self.n
                )
            # int8 scan for the shortlist, exact host f32 re-score for the
            # order (see __init__: measured 0.972 -> 1.000 recall@10).
            kr = min(_repair_width(k), max(self.n, 1))
            _, ids = cosine_topk_fused_int8(
                q, self.matrix_t, self.scales, kr, n_valid=self.n
            )
            return _exact_rerank_host(q, ids, self._exact_rows, k)
        return cosine_topk(q, self.matrix_t, k, n_valid=self.n, method=method)

    def _meta_arrays(self):
        """Vectorized metadata columns (built lazily, cached): each column
        is (int32 codes, {value: code} vocab) so million-row filter masks
        are integer compares (~2 ms at 1M), not string-array scans
        (np.isin over a 1M str array costs tens of ms PER CONDITION PER
        QUERY — measured as a dominant serving term at 1M chunks)."""
        cached = getattr(self, "_meta", None)
        if cached is None or cached[0] != len(self.records):
            def encode(values):
                vocab: dict = {}
                codes = np.empty(len(values), np.int32)
                for i, v in enumerate(values):
                    c = vocab.get(v)
                    if c is None:
                        c = vocab[v] = len(vocab)
                    codes[i] = c
                return codes, vocab

            periods = encode([r.period for r in self.records])
            ctypes = encode([r.chunk_type for r in self.records])
            companies = encode(
                [getattr(r, "company", "ICICI Bank") for r in self.records]
            )
            cached = (len(self.records), periods, ctypes, companies)
            self._meta = cached
        return cached[1], cached[2], cached[3]

    def _filter_mask(
        self,
        period: Optional[str] = None,
        chunk_type: Optional[str] = None,
        predicate=None,
        periods: Optional[Sequence[str]] = None,
        company: Optional[str] = None,
    ) -> Optional[np.ndarray]:
        """Metadata filter → row mask (Milvus filter-expression capability).

        ``periods`` (a list) expresses the Milvus ``period in [...]`` form
        used by multi-quarter questions; ``period`` is the single-value
        shorthand. All conditions AND together."""
        if (
            period is None and chunk_type is None and predicate is None
            and not periods and company is None
        ):
            return None
        want = list(periods) if periods else ([period] if period else None)
        cache_key = None
        if predicate is None:
            # Stable filters repeat across queries/tiers — cache the host
            # mask (the device upload is cached separately, but recomputing
            # the numpy mask per query still costs ms at 1M rows).
            cache_key = (
                tuple(sorted(want)) if want else None, chunk_type, company,
                len(self.records),
            )
            cache = getattr(self, "_host_mask_cache", None)
            if cache is None:
                cache = self._host_mask_cache = {}
            hit = cache.get(cache_key)
            if hit is not None:
                return hit
        n_pad = int(self.matrix_t.shape[1])
        (pcodes, pvocab), (ccodes, cvocab), (ocodes, ovocab) = self._meta_arrays()
        mask = np.ones((len(self.records),), bool)
        if want is not None:
            codes = [pvocab[p] for p in want if p in pvocab]
            if len(codes) == 1:
                mask &= pcodes == codes[0]
            else:
                mask &= np.isin(pcodes, np.asarray(codes, np.int32))
        if chunk_type is not None:
            code = cvocab.get(chunk_type)
            mask &= (ccodes == code) if code is not None else False
        if company is not None:
            code = ovocab.get(company)
            mask &= (ocodes == code) if code is not None else False
        if predicate is not None:
            for i in np.nonzero(mask)[0]:
                if not predicate(self.records[int(i)]):
                    mask[i] = False
        out = np.zeros((n_pad,), bool)
        out[: len(self.records)] = mask
        if cache_key is not None:
            if len(self._host_mask_cache) > 64:
                self._host_mask_cache.clear()
            self._host_mask_cache[cache_key] = out
        return out

    def integrity_column(self) -> np.ndarray:
        """Per-chunk figure-consistency multipliers (weight-1), padded to the
        device matrix width with ones. Computed once (lazily) per corpus —
        ~14k chunks/s host-side, so a 1M-chunk index pays ~70 s on the first
        integrity-weighted query (or at build time via ``precompute``)."""
        cached = getattr(self, "_integrity_col", None)
        width = self.matrix_t.shape[1]
        if cached is None or len(cached) != width:
            from ..retrieval.consistency import consistency_checks

            vals = np.ones(width, np.float32)
            for i, r in enumerate(self.records):
                p, c = consistency_checks(r.text)
                if c:
                    vals[i] = p / c
            self._integrity_col = vals
            cached = vals
        return cached

    # Largest filtered candidate set served by the exact-sparse host path;
    # bigger buckets go through the device JL projection as usual.
    exact_bucket_max = 65536

    def _bucket_postings(self, rows: np.ndarray, key):
        """Inverted postings over one filter bucket's exact TF-IDF vectors
        (cached per filter key — buckets repeat across queries/tiers)."""
        cache = getattr(self, "_bucket_cache", None)
        if cache is None:
            cache = self._bucket_cache = {}
        entry = cache.get(key)
        if entry is not None:
            return entry
        texts = [self.records[int(r)].text for r in rows]
        ids, wts = self.featurizer.encode_batch(texts)
        norms = np.linalg.norm(wts, axis=1, keepdims=True)
        wts = (wts / np.maximum(norms, 1e-12)).astype(np.float32)
        doc_idx = np.repeat(np.arange(len(rows), dtype=np.int32), ids.shape[1])
        flat_ids = ids.ravel()
        flat_w = wts.ravel()
        nz = flat_w != 0
        flat_ids, flat_w, doc_idx = flat_ids[nz], flat_w[nz], doc_idx[nz]
        order = np.argsort(flat_ids, kind="stable")
        flat_ids, flat_w, doc_idx = flat_ids[order], flat_w[order], doc_idx[order]
        uniq, starts = np.unique(flat_ids, return_index=True)
        bounds = np.append(starts, flat_ids.size)
        lookup = {int(f): (int(s), int(e)) for f, s, e in zip(uniq, bounds[:-1], bounds[1:])}
        entry = (rows, lookup, flat_w, doc_idx)
        if len(cache) > 64:  # bound memory across many distinct plans
            cache.clear()
        cache[key] = entry
        return entry

    def _exact_bucket_search(
        self, queries, rows, key, top_k, consistency_weight, consistency_strict
    ):
        """Exact sparse TF-IDF cosine over a (small) filtered bucket.

        Inside a metadata-scoped bucket of near-duplicates the device JL
        projection's noise (~1/sqrt(384) ≈ 0.05) exceeds the true score
        gaps, so a JL shortlist of ANY practical width can miss the gold
        document entirely — scoring the bucket in the true TF-IDF space is
        both exact and cheap (the bucket is orders of magnitude smaller than
        the corpus). Integrity gating applies multiplicatively as in the
        device path."""
        from ..retrieval.consistency import smooth, strictify

        rows_arr, lookup, flat_w, doc_idx = self._bucket_postings(rows, key)
        mult = None
        if consistency_weight > 0:
            col = self.integrity_column()[rows_arr]
            if consistency_strict:
                mult = strictify(col, consistency_weight).astype(np.float32)
            else:
                mult = smooth(col, consistency_weight).astype(np.float32)
        qids, qwts = self.featurizer.encode_batch(list(queries))
        qnorm = np.linalg.norm(qwts, axis=1, keepdims=True)
        qwts = qwts / np.maximum(qnorm, 1e-12)
        out = []
        for qi in range(len(queries)):
            scores = np.zeros(len(rows_arr), np.float32)
            for fid, w in zip(qids[qi], qwts[qi]):
                if not w:
                    continue
                se = lookup.get(int(fid))
                if se is None:
                    continue
                s, e = se
                np.add.at(scores, doc_idx[s:e], flat_w[s:e] * np.float32(w))
            if mult is not None:
                scores = np.where(scores > 0, scores * mult, scores)
            k = min(top_k, scores.size)
            # Full (score desc, row asc) sort — NOT argpartition: among
            # exact-score ties (hundreds of figure-perturbed near-
            # duplicates collapse to identical retrieval features) the
            # partition picks an arbitrary k, which can drop the gold row
            # that the stable lowest-row tie-break would keep.
            order = np.lexsort((rows_arr, -scores))[:k]
            hits = []
            for rank, li in enumerate(order):
                hits.append(
                    SearchHit(float(scores[li]), self.records[int(rows_arr[li])], rank)
                )
            out.append(hits)
        return out

    def _sparse_rerank(self, query: str, hits: list, top_k: int) -> list:
        """Exact sparse TF-IDF cosine re-rank of a device shortlist.

        The hashed backend's device scores are a Johnson-Lindenstrauss
        approximation of TF-IDF cosine (models/featurizer.py); at million-
        chunk scale the JL error (~1/sqrt(384)) exceeds the true score gaps
        between near-duplicate candidates. Re-scoring the shortlist exactly
        on host removes the projection noise — the standard coarse-then-exact
        two-stage retrieval design."""
        featurizer = getattr(self, "featurizer", None)
        if featurizer is None or not hits:
            return hits[:top_k]
        texts = [query] + [h.record.text for h in hits]
        ids, wts = featurizer.encode_batch(texts)
        norms = np.linalg.norm(wts, axis=1, keepdims=True)
        wts = wts / np.maximum(norms, 1e-12)
        qv = dict(zip(ids[0].tolist(), wts[0].tolist()))
        rescored = []
        for row, h in enumerate(hits, start=1):
            s = 0.0
            for fid, w in zip(ids[row], wts[row]):
                if w:
                    s += w * qv.get(int(fid), 0.0)
            rescored.append((-s, h.record.id, h, s))
        rescored.sort(key=lambda t: (t[0], t[1]))
        out = []
        for rank, (_, _, h, s) in enumerate(rescored[:top_k]):
            h.score = float(s)
            h.rank = rank
            out.append(h)
        return out

    def search_texts(
        self,
        queries: Sequence[str],
        top_k: int = 3,
        method: str = "auto",
        period: Optional[str] = None,
        chunk_type: Optional[str] = None,
        predicate=None,
        periods: Optional[Sequence[str]] = None,
        company: Optional[str] = None,
        rerank: int = 0,
        consistency_weight: float = 0.0,
        consistency_strict: bool = True,
        query_expansion: bool = True,
    ) -> list[list[SearchHit]]:
        """Encode query texts with the index's featurizer+encoder and search.

        Mirrors ``collection.search(...)`` with COSINE + output fields
        (retrieve.py:28-34); ``period``/``periods``/``chunk_type``/
        ``predicate`` add metadata-filtered search (Milvus filter
        expressions). ``rerank=R > 0`` fetches a device shortlist of R
        candidates and exactly re-scores them with sparse TF-IDF cosine on
        host (hashed backend only) — removes the JL projection noise that
        dominates ranking among near-duplicates at large corpus scale.
        Filtered searches on a quantized index scan int8 with a widened
        shortlist (max(k+6, 16) — measured sufficient for exact repair at
        1M and 10M) and exact-repair the order against the host f32
        shadow rows (same repair as the unfiltered path; skipped in
        integrity mode, where device scores carry the consistency
        multiplier).

        ``consistency_weight > 0`` adds a final figure-consistency re-rank
        over the (sparse-reranked) shortlist: similarity is scaled by how
        well a chunk's self-declared arithmetic ties out
        (retrieval/consistency.py) — the defense against in-scope
        figure-tampered near-duplicates that metadata filters cannot reject.
        """
        queries = self._expand_for_search(queries, query_expansion)
        fetch_k = max(top_k, rerank)
        mask = self._filter_mask(
            period, chunk_type, predicate, periods=periods, company=company
        )
        if predicate is None:
            # Integrity mode + a filter bucket: score the bucket EXACTLY in
            # the true sparse TF-IDF space (see _exact_bucket_search — the
            # JL shortlist is structurally unreliable among scoped
            # near-duplicates). Falls through to the device path for
            # oversized buckets. (Predicate filters have no stable cache
            # key, so they stay on the device path.) Queries are encoded
            # only AFTER this gate: the host path must stay zero-dispatch
            # (an eager device encode here would cost a tunnel round trip
            # whose result is discarded).
            plan = self._exact_bucket_plan(
                mask, consistency_weight, periods, period, chunk_type, company
            )
            if plan is not None:
                return self._exact_bucket_search(
                    queries, plan[0], plan[1], top_k,
                    consistency_weight, consistency_strict,
                )
        q = _pad_queries(self._encode_queries(queries))
        # Integrity-weighted candidate generation: scale positive
        # similarities by the chunk's consistency multiplier ON DEVICE,
        # before selection — a tampered near-duplicate then loses at fetch
        # time instead of requiring a shortlist wider than the forgery
        # cluster. Runs through the dense path (the weighting fuses into
        # the matmul epilogue).
        score_mult = (
            self._integrity_mult(consistency_weight, consistency_strict)
            if consistency_weight > 0
            else None
        )
        if mask is not None or score_mult is not None:
            row_mask = None
            if mask is not None:
                if predicate is None:
                    # Stable filter key → cache the mask on device (see
                    # _device_row_mask; avoids a per-query host→device
                    # upload that dominates serving at 1M+ chunks).
                    mkey = (
                        tuple(sorted(periods)) if periods else period,
                        chunk_type, company,
                    )
                    row_mask = self._device_row_mask(mkey, mask)
                else:
                    row_mask = jnp.asarray(mask)
            if self.quantized:
                from ..ops.topk import cosine_topk_dense_int8

                repair = self._repairable(consistency_weight)
                dev_k = min(_repair_width(fetch_k) if repair else fetch_k, max(self.n, 1))
                scores, rows = cosine_topk_dense_int8(
                    jnp.asarray(q, jnp.float32),
                    self.matrix_t,
                    self.scales,
                    dev_k,
                    n_valid=self.n,
                    row_mask=row_mask,
                    score_mult=score_mult,
                )
                if repair:
                    scores, rows = self._exact_repair(
                        q, scores, rows, min(fetch_k, dev_k)
                    )
            else:
                from ..ops.topk import cosine_topk_dense

                scores, rows = cosine_topk_dense(
                    jnp.asarray(q, jnp.float32),
                    self.matrix_t,
                    min(fetch_k, max(self.n, 1)),
                    n_valid=self.n,
                    row_mask=row_mask,
                    score_mult=score_mult,
                )
        else:
            scores, rows = self.search_embeddings(q, top_k=fetch_k, method=method)
        return self._postprocess_device_hits(
            queries, scores, rows, top_k, rerank, consistency_weight, consistency_strict
        )

    def _exact_repair(self, q, scores, rows, keep: int):
        """Exact host re-score of a FILTERED int8 device shortlist.

        The unfiltered path repairs through search_embeddings (see
        __init__: int8 id agreement vs the f32 oracle is 0.972@10; the
        host-f32 re-score of a 16-wide shortlist measured 1.000 at 1M and
        10M) — this is the same repair for the masked/tier paths, which
        would otherwise serve dequantized-int8 order whenever a semantic
        backend (no sparse re-rank) runs over a quantized index. Only
        entries the device scored FINITE are re-scored: a masked-out row
        must never re-enter on its raw cosine. Returns (scores, rows)
        truncated to ``keep`` with the oracle tie-break.
        """
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        q = np.asarray(q, np.float32)[: rows.shape[0]]
        safe = np.clip(rows, 0, max(self.n - 1, 0))
        cand = self._exact_rows[safe.reshape(-1)].reshape(rows.shape + (self.dim,))
        exact = np.einsum("qd,qkd->qk", q, cand)
        valid = np.isfinite(scores) & (rows < self.n)
        exact = np.where(valid, exact, -np.inf)
        return _oracle_truncate(exact, rows, keep)

    def _repairable(self, consistency_weight: float) -> bool:
        """Whether the filtered int8 paths should widen the device fetch
        (to ``_repair_width``: max(k+6, 16)) and exact-repair on host.
        Off in integrity mode: the device scores carry the consistency
        multiplier, which a raw-cosine re-score would silently strip.
        Off on an EMPTY index: the shadow row matrix has zero rows, so
        the repair's fancy-index would raise where the device path
        gracefully returns no hits."""
        return (
            self.quantized
            and self.n > 0
            and self._exact_rows is not None
            and self._exact_rows.size > 0
            and consistency_weight <= 0
        )

    def _postprocess_device_hits(
        self, queries, scores, rows, top_k, rerank, consistency_weight, consistency_strict
    ):
        """Device shortlist → SearchHit lists: validity filter, optional
        exact sparse re-rank, optional consistency re-rank."""
        scores = np.asarray(scores)
        rows = np.asarray(rows)
        out = []
        for qi in range(len(queries)):
            hits = []
            for rank in range(scores.shape[1]):
                row = int(rows[qi, rank])
                if row >= self.n or not np.isfinite(scores[qi, rank]):
                    continue
                hits.append(SearchHit(float(scores[qi, rank]), self.records[row], rank))
            # With a consistency stage downstream, the sparse re-rank must
            # hand over a WIDE shortlist: the gold document can sit below
            # dozens of tampered near-duplicates on pure similarity, and a
            # top_k-truncated handoff would drop it before the consistency
            # evidence is consulted.
            keep = top_k if consistency_weight <= 0 else len(hits)
            if rerank:
                # No-op for semantic (featurizer-less) backends.
                hits = self._sparse_rerank(queries[qi], hits, keep)
            if consistency_weight > 0 and rerank and self.featurizer is not None:
                # The sparse re-rank REPLACED the (integrity-weighted)
                # device scores with raw exact cosines, so the multiplier
                # must be re-applied. Without a sparse re-rank — rerank=0,
                # or a featurizer-less semantic backend where
                # _sparse_rerank is a no-op — the device scores already
                # carry it, and re-applying would square the penalty and
                # diverge from the exact-bucket path's similarity x
                # multiplier semantics.
                from ..retrieval.consistency import consistency_rerank

                cache = getattr(self, "_consistency_cache", None)
                if cache is None:
                    cache = self._consistency_cache = {}
                hits = consistency_rerank(
                    hits, top_k, weight=consistency_weight, cache=cache,
                    strict=consistency_strict,
                )
            else:
                hits = hits[:top_k]
            out.append(hits)
        return out

    def _expand_for_search(self, queries, query_expansion: bool) -> list:
        """Query-side financial-idiom expansion (models/synonyms.py) for the
        hashed backend; documents are never expanded."""
        queries = list(queries)
        embedder = getattr(self, "embedder", None)
        hashed = getattr(embedder, "backend", "hashed") == "hashed"
        if query_expansion and hashed and self.featurizer is not None:
            from ..models.synonyms import expand_queries

            queries = expand_queries(queries)
        return queries

    def _encode_queries(self, queries):
        embedder = getattr(self, "embedder", None)
        if embedder is not None:
            return embedder.encode_texts(queries)
        if self.featurizer is not None and self.encoder is not None:
            ids, wts = self.featurizer.encode_batch(queries)
            return self.encoder.encode(ids, wts)
        raise ValueError(
            "no embedder attached to this index; use search_embeddings "
            "or construct via DeviceVectorIndex.build/load"
        )

    def _exact_bucket_plan(
        self, mask, consistency_weight, periods, period, chunk_type, company
    ):
        """(bucket_rows, cache_key) when the exact-sparse host path should
        answer this filter (integrity mode + a small scoped bucket — see
        _exact_bucket_search), else None. The single gate both search_texts
        and search_texts_tiers consult."""
        if not (
            consistency_weight > 0
            and mask is not None
            and self.featurizer is not None
        ):
            return None
        bucket_rows = np.nonzero(mask[: len(self.records)])[0]
        if not (0 < bucket_rows.size <= self.exact_bucket_max):
            return None
        key = (tuple(sorted(periods)) if periods else period, chunk_type, company)
        return bucket_rows, key

    def _integrity_mult(self, consistency_weight: float, consistency_strict: bool):
        """Device-resident multiplier column, cached per (weight, strict) —
        recomputing the [N] array and re-uploading ~4 MB through the
        dispatch-bound tunnel on every search would tax exactly the
        latency the one-dispatch work saves."""
        cache = getattr(self, "_integrity_mult_cache", None)
        if cache is None:
            cache = self._integrity_mult_cache = {}
        key = (round(consistency_weight, 6), consistency_strict, self.matrix_t.shape[1])
        hit = cache.get(key)
        if hit is not None:
            return hit
        from ..retrieval.consistency import smooth, strictify

        col = self.integrity_column()
        if consistency_strict:
            mult = jnp.asarray(strictify(col, consistency_weight).astype(np.float32))
        else:
            mult = jnp.asarray(smooth(col, consistency_weight).astype(np.float32))
        cache[key] = mult
        return mult

    def _device_cached_mask(self, key, build) -> jax.Array:
        """Get-or-upload a device mask under ``key`` (bounded cache).

        At 1M chunks a tier group's boolean mask stack is 2-4 MB;
        re-uploading it host→device on EVERY query dominated serving
        latency through the dispatch-bound tunnel (serving_e2e @1M p50
        297 ms vs ~7 ms of actual device work — `serving_topk_1m` probe).
        Filter vocabularies are tiny (periods × chunk types × companies),
        so the distinct masks a deployment ever uses number in the dozens:
        upload each once."""
        cache = getattr(self, "_device_mask_cache", None)
        if cache is None:
            cache = self._device_mask_cache = {}
        full_key = (*key, self.matrix_t.shape[1])
        hit = cache.get(full_key)
        if hit is not None:
            return hit
        dev = build()
        if len(cache) > 32:  # bound HBM held by cached masks (~4 MB each @1M)
            cache.clear()
        cache[full_key] = dev
        return dev

    def _device_tier_masks(self, group_key, device_tiers) -> jax.Array:
        """Device-resident [G, N] tier-mask stack, cached per tier-group key."""
        return self._device_cached_mask(
            ("group", group_key),
            lambda: jnp.asarray(np.stack([m for _, m in device_tiers])),
        )

    def _device_row_mask(self, key, mask: np.ndarray) -> jax.Array:
        """Single [N] device row mask, cached per filter key (the one-filter
        ``search_texts`` path)."""
        return self._device_cached_mask(("single", key), lambda: jnp.asarray(mask))

    def search_texts_tiers(
        self,
        queries: Sequence[str],
        tier_filters: Sequence[dict],
        top_k: int = 3,
        method: str = "auto",
        rerank: int = 0,
        consistency_weight: float = 0.0,
        consistency_strict: bool = True,
        query_expansion: bool = True,
    ) -> list[list[list["SearchHit"]]]:
        """All filter tiers of a query group in ONE device dispatch.

        Equivalent to ``[search_texts(queries, **f) for f in tier_filters]``
        but the [Q, N] score matrix is computed once and every tier's mask +
        top-k runs in the same device program (ops/topk.py
        cosine_topk_dense_multi) — serving latency through the axon tunnel
        is dispatch-bound (~40-80 ms per round trip), so tier count no
        longer multiplies it. Integrity-mode tiers whose filter bucket is
        small are answered by the host exact-sparse path (zero dispatches),
        exactly as in ``search_texts``.
        """
        if any(f.get("predicate") is not None for f in tier_filters):
            return [
                self.search_texts(
                    queries, top_k=top_k, method=method, rerank=rerank,
                    consistency_weight=consistency_weight,
                    consistency_strict=consistency_strict,
                    query_expansion=query_expansion, **f,
                )
                for f in tier_filters
            ]

        queries = self._expand_for_search(queries, query_expansion)

        width = self.matrix_t.shape[1]
        results: dict[int, list] = {}
        device_tiers: list[tuple[int, np.ndarray]] = []
        tier_keys: list = []
        for ti, flt in enumerate(tier_filters):
            mask = self._filter_mask(
                flt.get("period"), flt.get("chunk_type"), None,
                periods=flt.get("periods"), company=flt.get("company"),
            )
            plan = self._exact_bucket_plan(
                mask, consistency_weight, flt.get("periods"), flt.get("period"),
                flt.get("chunk_type"), flt.get("company"),
            )
            if plan is not None:
                results[ti] = self._exact_bucket_search(
                    queries, plan[0], plan[1], top_k,
                    consistency_weight, consistency_strict,
                )
                continue
            if mask is None:
                mask = np.ones(width, bool)
            device_tiers.append((ti, mask))
            periods_f = flt.get("periods")
            tier_keys.append((
                tuple(sorted(periods_f)) if periods_f else flt.get("period"),
                flt.get("chunk_type"), flt.get("company"),
            ))

        if device_tiers:
            q = _pad_queries(self._encode_queries(queries))
            score_mult = (
                self._integrity_mult(consistency_weight, consistency_strict)
                if consistency_weight > 0
                else None
            )
            fetch_k = min(max(top_k, rerank), max(self.n, 1))
            masks = self._device_tier_masks(tuple(tier_keys), device_tiers)
            if self.quantized:
                from ..ops.topk import cosine_topk_dense_multi_int8

                repair = self._repairable(consistency_weight)
                dev_k = min(_repair_width(fetch_k) if repair else fetch_k, max(self.n, 1))
                s_all, r_all = cosine_topk_dense_multi_int8(
                    jnp.asarray(q, jnp.float32), self.matrix_t, self.scales,
                    dev_k, masks, n_valid=self.n, score_mult=score_mult,
                )
                if repair:
                    keep = min(fetch_k, dev_k)
                    pairs = [
                        self._exact_repair(q, s_all[gi], r_all[gi], keep)
                        for gi in range(len(device_tiers))
                    ]
                    s_all = np.stack([p[0] for p in pairs])
                    r_all = np.stack([p[1] for p in pairs])
            else:
                from ..ops.topk import cosine_topk_dense_multi

                s_all, r_all = cosine_topk_dense_multi(
                    jnp.asarray(q, jnp.float32), self.matrix_t,
                    fetch_k, masks, n_valid=self.n, score_mult=score_mult,
                )
            s_all = np.asarray(s_all)
            r_all = np.asarray(r_all)
            for gi, (ti, _) in enumerate(device_tiers):
                results[ti] = self._postprocess_device_hits(
                    queries, s_all[gi], r_all[gi], top_k, rerank,
                    consistency_weight, consistency_strict,
                )
        return [results[ti] for ti in range(len(tier_filters))]

    # --- incremental insert (Milvus `collection.insert` parity) -----------
    def extended_with(
        self, new_chunks: Sequence[IndexedChunk], refit: bool = True
    ) -> "DeviceVectorIndex":
        """New index with ``new_chunks`` appended.

        With the corpus-dependent hashed embedder, ``refit=True`` (default)
        refits the TF-IDF analyzer over the union and re-encodes everything —
        otherwise new documents' novel terms would be OOV under the frozen
        IDF and invisible to queries. ``refit=False`` appends under the
        frozen analyzer (cheap, embedding-stable; right for corpus-independent
        embedders like MiniLM, where it is the default behavior regardless).
        """
        embedder = getattr(self, "embedder", None)
        if embedder is None:
            raise ValueError("index has no embedder; rebuild instead")
        all_records = list(self.records) + list(new_chunks)
        corpus_dependent = getattr(embedder, "featurizer", None) is not None
        if refit and corpus_dependent:
            from ..models.embedder import HashedEmbedder
            from ..models.featurizer import HashedFeaturizer

            fresh = HashedFeaturizer(
                vocab_size=embedder.featurizer.vocab_size,
                sublinear_tf=embedder.featurizer.sublinear_tf,
                bigram_weight=embedder.featurizer.bigram_weight,
                drop_oov=embedder.featurizer.drop_oov,
            )
            embedder = HashedEmbedder(featurizer=fresh, encoder=embedder.encoder)
            embedder.fit([r.text for r in all_records])
            matrix = embedder.encode_texts([r.text for r in all_records])
        else:
            if self.quantized and self._exact_rows is not None:
                # The shadow rows ARE the pre-quantization f32 embeddings:
                # rebuilding from dequantized matrix columns would bake one
                # int8 rounding into the new index's "exact" rerank rows
                # (and compound across repeated inserts).
                old = self._exact_rows
            elif self.quantized:
                old = np.asarray(self.matrix_t.astype(jnp.float32) * self.scales)[:, : self.n].T
            else:
                old = np.asarray(self.matrix_t[:, : self.n].T, np.float32)
            new = embedder.encode_texts([c.text for c in new_chunks])
            matrix = np.concatenate([old, new], axis=0)
        out = DeviceVectorIndex(
            matrix,
            all_records,
            name=self.name,
            dtype="int8" if self.quantized else self.matrix_t.dtype,
            normalize=False,
        )
        out.embedder = embedder
        out.encoder = getattr(embedder, "encoder", None)
        out.featurizer = getattr(embedder, "featurizer", None)
        return out

    # --- point lookups (Milvus `query(expr="id in [...]")` parity) -------
    def get_by_ids(self, chunk_ids: Sequence[str]) -> list[IndexedChunk]:
        return [self.records[self._by_id[c]] for c in chunk_ids if c in self._by_id]

    def __contains__(self, chunk_id: str) -> bool:
        return chunk_id in self._by_id

    def __len__(self) -> int:
        return self.n

    def stats(self) -> dict:
        """Collection stats (vector_rag_mcp/main.py:157-169 parity)."""
        periods = sorted({r.period for r in self.records})
        types = sorted({r.chunk_type for r in self.records})
        return {
            "collection": self.name,
            "num_entities": self.n,
            "dim": self.dim,
            "padded_rows": int(self.matrix_t.shape[1]),
            "dtype": str(self.matrix_t.dtype),
            "periods": periods,
            "chunk_types": types,
            "index_type": "FLAT_EXACT",
            "metric_type": "COSINE",
        }

    # --- persistence ------------------------------------------------------
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        if self.quantized and self._exact_rows is not None:
            # Persist the PRE-quantization f32 rows (the shadow): saving the
            # dequantized matrix would bake int8 rounding into the reloaded
            # index's exact-rerank rows and drift tie-breaks across restart.
            dense = self._exact_rows
        elif self.quantized:
            dense = (self.matrix_t.astype(jnp.float32) * self.scales)[:, : self.n].T
        else:
            dense = self.matrix_t[:, : self.n].T
        dense = np.asarray(dense, np.float32)
        from ..utils import indexio

        if indexio.available():
            # Native RGFI format: uncompressed + CRC32 — the fast path for
            # multi-GB matrices where npz compression takes minutes.
            indexio.write_array(os.path.join(directory, "matrix.rgfi"), dense)
        else:
            np.savez_compressed(os.path.join(directory, "matrix.npz"), matrix=dense)
        meta = {
            "name": self.name,
            "n": self.n,
            "dim": self.dim,
            # Matrix is persisted dequantized f32; record the serving dtype
            # so load() reconstructs the same tier (an int8 index must not
            # silently round-trip to a 4x-bigger f32 one).
            "dtype": "int8" if self.quantized else str(self.matrix_t.dtype),
            "records": [r.model_dump() for r in self.records],
        }
        if getattr(self, "featurizer", None) is not None:
            meta["featurizer"] = self.featurizer.state_dict()
        if getattr(self, "encoder", None) is not None:
            meta["encoder"] = self.encoder.state_dict()
            if getattr(self.encoder, "tuned", False):
                # A fine-tuned projection table cannot be regenerated from
                # the seed; without it the reloaded encoder would encode
                # queries against a DIFFERENT table than the saved matrix.
                np.save(
                    os.path.join(directory, "encoder_table.npy"),
                    np.asarray(self.encoder.table, np.float32),
                )
            else:
                stale = os.path.join(directory, "encoder_table.npy")
                if os.path.exists(stale):
                    # Untuned re-save over a previously-tuned directory:
                    # drop the old table or load() would attach a
                    # projection that doesn't match this matrix.
                    os.remove(stale)
        embedder = getattr(self, "embedder", None)
        if embedder is not None and getattr(embedder, "backend", "hashed") != "hashed":
            meta["embedder"] = embedder.state_dict()
        with open(os.path.join(directory, "index.json"), "w") as f:
            json.dump(meta, f, ensure_ascii=False)

    @classmethod
    def load(cls, directory: str, **kwargs) -> "DeviceVectorIndex":
        with open(os.path.join(directory, "index.json")) as f:
            meta = json.load(f)
        rgfi = os.path.join(directory, "matrix.rgfi")
        if os.path.exists(rgfi) or os.path.exists(rgfi + ".npy"):
            from ..utils import indexio

            matrix = indexio.read_array(rgfi)
        else:
            matrix = np.load(os.path.join(directory, "matrix.npz"))["matrix"]
        records = [IndexedChunk(**r) for r in meta["records"]]
        if "dtype" not in kwargs and "dtype" in meta:
            kwargs["dtype"] = meta["dtype"]
        index = cls(matrix, records, name=meta.get("name", DEFAULT_COLLECTION), **kwargs)
        if "featurizer" in meta:
            index.featurizer = HashedFeaturizer.from_state_dict(meta["featurizer"])
        if "encoder" in meta:
            tpath = os.path.join(directory, "encoder_table.npy")
            table = (
                jnp.asarray(np.load(tpath))
                if meta["encoder"].get("tuned") and os.path.exists(tpath)
                else None
            )
            index.encoder = BagEncoder.from_state_dict(meta["encoder"], table=table)
        if "embedder" in meta and meta["embedder"].get("backend") == "minilm":
            from ..models.embedder import MiniLMEmbedder

            index.embedder = MiniLMEmbedder(checkpoint=meta["embedder"].get("checkpoint"))
        elif "embedder" in meta and meta["embedder"].get("backend") == "trained":
            # Trained is the DEFAULT backend whenever the packaged
            # checkpoint exists — without this branch a persisted
            # deployment reloads with embedder=None and every search
            # raises (the engine's warmup swallows it, so the failure
            # surfaces as errors on live queries, not at startup).
            from ..models.embedder import TrainedEmbedder

            ckpt = meta["embedder"].get("checkpoint")
            if ckpt and not os.path.exists(os.path.join(ckpt, "config.json")):
                ckpt = None  # saved under a moved/renamed tree: packaged default
            index.embedder = TrainedEmbedder(checkpoint=ckpt)
        elif getattr(index, "featurizer", None) is not None and getattr(index, "encoder", None) is not None:
            from ..models.embedder import HashedEmbedder

            index.embedder = HashedEmbedder(featurizer=index.featurizer, encoder=index.encoder)
        return index
