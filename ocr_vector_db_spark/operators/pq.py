"""Product quantization (PQ) — vector compression as DataFrame expressions.

At 100 TB, raw float32 embeddings are the dominant storage cost
(768 dims ≈ 3 KB/vector). PQ splits each vector into M subvectors, learns a
K-centroid codebook per subspace (KMeans on a sample), and stores each
vector as M small codes: 768-d float32 → 8 bytes at M=8/K=256 — a ~384×
compression — while queries score against the codes via asymmetric distance
computation (ADC).

Spark-first shape (no Python in the scoring path):

- train:  FAISS-style codebook training on a BOUNDED sample collected to
          the driver (seeded kmeans++ + Lloyd's in numpy per subspace).
          Codebooks are tiny (M·K·dim/M floats) and classically trained on
          ~100k-1M sampled vectors regardless of corpus size, so the sample
          cap — not the corpus — bounds driver memory at 100 TB; only
          encode/search are distributed;
- encode: argmin over K per-subspace distances, built as literal-codebook
          expressions → whole-stage codegen, one pass, no UDF;
- search: the query's M×K distance table is computed on the DRIVER (tiny)
          and inlined as literals; approximate distance per row is M
          element_at lookups + adds. Optional exact re-rank of the top
          `refine` candidates restores near-exact top-k.

Reference tie-in: this is the "novel sketch" slot (SURVEY §2.9's ANN index
family) — the storage/recall knob pgvector tunes with HNSW/ivfflat, done
the columnar way.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.knn import knn_brute_force


def _sub_slices(dim: int, m: int) -> list[tuple[int, int]]:
    """M (start, length) 1-based slices covering dim."""
    assert dim % m == 0, f"dim {dim} not divisible by M={m}"
    w = dim // m
    return [(i * w + 1, w) for i in range(m)]


def _lloyd(X, k: int, rng, max_iter: int):
    """Seeded kmeans++ init + Lloyd's iterations over an in-memory sample.

    numpy import is deferred to call sites; X is (n, d) float64. Empty
    clusters are re-seeded from the point farthest from its center."""
    import numpy as np

    n = X.shape[0]
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.integers(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        total = d2.sum()
        if total <= 0:
            centers[i:] = X[rng.integers(n, size=k - i)]
            break
        centers[i] = X[rng.choice(n, p=d2 / total)]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        # (n, k) squared distances via ||x||² - 2x·c + ||c||²
        dist = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * X @ centers.T
            + (centers * centers).sum(axis=1)
        )
        assign = dist.argmin(axis=1)
        moved = 0.0
        for ci in range(k):
            mask = assign == ci
            if mask.any():
                new = X[mask].mean(axis=0)
            else:
                new = X[dist.min(axis=1).argmax()]
            moved += float(((centers[ci] - new) ** 2).sum())
            centers[ci] = new
        if moved < 1e-12:
            break
    return centers


class PQIndex:
    def __init__(self, dim: int, m: int, codebooks: list[list[list[float]]]):
        self.dim = dim
        self.m = m
        self.codebooks = codebooks          # [m][k][dim/m]
        self.k = len(codebooks[0])

    # --------------------------------------------------------------- train

    @classmethod
    def train(
        cls,
        df: DataFrame,
        dim: int,
        m: int = 8,
        k: int = 16,
        emb_col: str = "embedding",
        seed: int = 42,
        sample_fraction: float | None = None,
        max_iter: int = 20,
        sample_limit: int = 65536,
    ) -> "PQIndex":
        import numpy as np

        base = df.sample(sample_fraction, seed=seed) if sample_fraction else df
        rows = (
            base.select(F.col(emb_col).cast("array<double>").alias("v"))
            .limit(sample_limit)
            .collect()
        )
        X = np.asarray([r.v for r in rows], dtype=np.float64)
        if X.shape[0] < k:
            raise ValueError(f"need >= {k} sample vectors, got {X.shape[0]}")
        rng = np.random.default_rng(seed)
        codebooks = []
        for start, width in _sub_slices(dim, m):
            sub = np.ascontiguousarray(X[:, start - 1 : start - 1 + width])
            centers = _lloyd(sub, k, rng, max_iter)
            codebooks.append([[float(x) for x in c] for c in centers])
        return cls(dim, m, codebooks)

    # -------------------------------------------------------------- encode

    @staticmethod
    def _sql_double(x: float) -> str:
        """One double as a SQL literal. `repr(float)` is the shortest
        round-tripping decimal, so parsed doubles are bit-identical to
        the former Python-side ``F.lit`` literals; non-finite values
        (a degenerate k-means cluster can emit NaN/inf) render as the
        CAST forms — repr's 'nanD'/'infD' does not parse (ADVICE r15)."""
        import math

        x = float(x)
        if math.isnan(x):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(x):
            return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
        return f"{x!r}D"

    def _codebook_sql(self, mi: int) -> str:
        """Subspace codebook as a SQL literal array<array<double>>
        (K × dim/M)."""
        rows = ",".join(
            "array(" + ",".join(self._sql_double(x) for x in c) + ")"
            for c in self.codebooks[mi]
        )
        return f"array({rows})"

    def _codebook_lit(self, mi: int) -> Column:
        """Subspace codebook as a literal Column — generated SQL, one
        parse (q66's finding): the former
        ``F.array(*[F.array(*[F.lit(x) ...])])`` form cost ~145 Py4J
        round trips per subspace (~90 ms — ~0.7 s per encode_col at
        M=8), re-paid on every plan construction."""
        return F.expr(self._codebook_sql(mi))

    @staticmethod
    def _dist2(sub: Column, centroid: Column) -> Column:
        """Squared L2 distance between two array<double> columns."""
        return F.aggregate(
            F.zip_with(sub, centroid, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def encode_col(self, emb: Column | str) -> Column:
        """array<int> of M codes (argmin centroid per subspace).

        Distances are computed with higher-order functions over a literal
        codebook array rather than M·K·width unrolled scalar terms — the
        expression (and the task binary / codegen unit) stays O(M) sized.

        The whole expression is ONE generated-SQL parse (q66's finding;
        optimization r15): the per-Column form cost ~0.7 s of Py4J round
        trips per construction (literal codebooks + the Py4J lambda
        machinery of 2·M higher-order functions), re-paid on every
        build/add/serving plan. The parsed tree — slice, zip_with
        squared-diff fold, transform over the codebook, 1-based
        array_position of array_min — is the identical expression shape
        and float-op order. Accepts a Column or a column name; a Column
        that is not a plain named reference (dotted/derived expressions —
        previously valid inputs, ADVICE r15) falls back to the
        identically-shaped Column construction instead of raising."""
        name = (
            emb if isinstance(emb, str)
            else emb._jc.toString()  # e.g. "embedding" / "__residual"
        )
        if not name.replace("_", "").isalnum():
            return self._encode_col_column(
                F.col(emb) if isinstance(emb, str) else emb
            )
        v = f"cast(`{name}` as array<double>)"
        codes = []
        for mi, (start, width) in enumerate(_sub_slices(self.dim, self.m)):
            sub = f"slice({v}, {start}, {width})"
            dists = (
                f"transform({self._codebook_sql(mi)}, "
                f"c -> aggregate(zip_with({sub}, c, "
                f"(a, b) -> (a - b) * (a - b)), 0.0D, "
                f"(acc, x) -> acc + x))"
            )
            # array_position of the min is 1-based; code = position - 1
            codes.append(
                f"cast((array_position({dists}, array_min({dists})) - 1) "
                f"as int)"
            )
        return F.expr("array(" + ",".join(codes) + ")")

    def _encode_col_column(self, emb: Column) -> Column:
        """encode_col for arbitrary Column expressions: the pre-r15
        Column-based construction — the identical expression tree the
        generated SQL parses to, built through Py4J (slower to CONSTRUCT,
        so the named-reference fast path stays the default)."""
        v = emb.cast("array<double>")
        codes = []
        for mi, (start, width) in enumerate(_sub_slices(self.dim, self.m)):
            sub = F.slice(v, start, width)
            dists = F.transform(
                self._codebook_lit(mi), lambda c: self._dist2(sub, c)
            )
            codes.append(
                (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
            )
        return F.array(*codes)

    def encode(self, df: DataFrame, emb_col: str = "embedding",
               out_col: str = "pq_codes") -> DataFrame:
        return df.withColumn(out_col, self.encode_col(F.col(emb_col)))

    # -------------------------------------------------------------- search

    def distance_tables(self, query: list[float]) -> list[list[float]]:
        """[m][k] squared distances of the query's subvectors to each
        centroid — M·K floats, computed driver-side."""
        tables = []
        for mi, (start, width) in enumerate(_sub_slices(self.dim, self.m)):
            qsub = query[start - 1 : start - 1 + width]
            tables.append([
                sum((a - b) ** 2 for a, b in zip(qsub, c)) for c in self.codebooks[mi]
            ])
        return tables

    def adc_distance_col(self, codes: Column, query: list[float]) -> Column:
        """Asymmetric distance: Σ_m table[m][code[m]] — M lookups per row."""
        tables = self.distance_tables(query)
        expr = F.lit(0.0)
        for mi, table in enumerate(tables):
            lit_table = F.array(*[F.lit(float(x)) for x in table])
            expr = expr + F.element_at(lit_table, F.element_at(codes, mi + 1) + 1)
        return expr

    def search(
        self,
        encoded: DataFrame,
        query: list[float],
        kk: int,
        codes_col: str = "pq_codes",
        id_col: str = "vec_id",
        emb_col: str | None = "embedding",
        refine: int = 4,
    ) -> DataFrame:
        """Top-k by ADC distance; when the raw `emb_col` is still present,
        the top k·refine candidates are re-ranked exactly (standard PQ+refine
        — the scan stays code-only, exact math touches k·refine rows)."""
        scored = encoded.withColumn(
            "pq_distance", F.round(self.adc_distance_col(F.col(codes_col), query), 6)
        )
        if emb_col is None:
            return scored.orderBy("pq_distance", id_col).limit(kk)
        cand = scored.orderBy("pq_distance", id_col).limit(kk * refine)
        return (
            knn_brute_force(cand, query, kk, emb_col=emb_col, id_col=id_col)
        )

    def compression_ratio(self) -> float:
        raw = self.dim * 4                     # float32 bytes
        coded = self.m * (1 if self.k <= 256 else 2)
        return raw / coded

    def recall_at_k(self, df: DataFrame, queries: list[list[float]], kk: int = 10,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    refine: int = 4) -> float:
        """Test-instrumentation recall (per-query loop — the ADC distance
        table is a query-specific literal, so each query is its own plan).
        For sweeps over many queries/settings use the distributed
        `IVFIndex.recall_sweep`; batch serving goes through `knn_batch`."""
        encoded = self.encode(df, emb_col).cache()
        hits = total = 0
        for qv in queries:
            exact = {r[id_col] for r in knn_brute_force(df, qv, kk, emb_col=emb_col, id_col=id_col).collect()}
            approx = {r[id_col] for r in self.search(encoded, qv, kk, id_col=id_col,
                                                     emb_col=emb_col, refine=refine).collect()}
            hits += len(exact & approx)
            total += len(exact)
        encoded.unpersist()
        return hits / total if total else 1.0


def quantization_error(index: PQIndex, df: DataFrame, emb_col: str = "embedding") -> float:
    """Mean squared reconstruction error over the corpus (codebook quality)."""
    enc = index.encode(df, emb_col)
    v = F.col(emb_col).cast("array<double>")
    err = F.lit(0.0)
    for mi, (start, width) in enumerate(_sub_slices(index.dim, index.m)):
        sub = F.slice(v, start, width)
        chosen = F.element_at(
            index._codebook_lit(mi), F.element_at(F.col("pq_codes"), mi + 1) + 1
        )
        err = err + index._dist2(sub, chosen)
    row = enc.agg(F.avg(err).alias("mse")).head()
    return float(row.mse) if row.mse is not None else math.nan
