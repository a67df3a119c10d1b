"""Scalar quantization of vector columns (storage/shuffle compression).

Row-wise uint8 scalar quantization: each vector is encoded against its
own [min, max] range — ``code_i = floor((x_i - min) / scale + 0.5)``
with ``scale = (max - min) / 255``.  At 100 TB an ``array<float>``
embedding column is usually the widest column in the table; 8-bit codes
cut its storage and shuffle footprint 4× while keeping ~0.2% relative
reconstruction error, which is below the noise floor of cosine/L2
near-duplicate thresholds.  (The serving-side analogue — PER-DIMENSION
codes over a whole index partition, used to cut the HNSW beam's gather
traffic — lives in ``operators/hnsw.HnswGraph.quantize``; this module
is the user-facing columnar codec.)

Everything here is a JVM-side column expression (no UDF): encode,
decode, and reconstruction error are `transform`/`aggregate`
higher-order functions, so Catalyst keeps the whole pipeline in
whole-stage codegen and the DuckDB oracle can reproduce the arithmetic
bit-exactly (all math in float64 with floor(x + 0.5) rounding — both
engines use IEEE754 doubles).

No reference counterpart (the reference stores raw float32 vectors,
index/hnsw_persistence.go:71-95); this is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _rmin(vec: Column) -> Column:
    return F.array_min(vec).cast("double")


def _scale(vec: Column) -> Column:
    s = (F.array_max(vec).cast("double") - _rmin(vec)) / F.lit(255.0)
    # constant vectors: any scale works, 1.0 keeps codes at 0
    return F.when(s > 0, s).otherwise(F.lit(1.0))


def sq8_encode(vec: Column) -> Column:
    """uint8 codes (as int array — parquet/Arrow have no u8 list type
    that DuckDB shares) for a float vector, row-range quantized."""
    rmin, scale = _rmin(vec), _scale(vec)
    return F.transform(
        vec,
        lambda x: F.floor((x.cast("double") - rmin) / scale + F.lit(0.5)).cast(
            "int"
        ),
    )


def sq8_decode(codes: Column, rmin: Column, scale: Column) -> Column:
    """Reconstructed float64 vector from codes + row range."""
    return F.transform(
        codes, lambda c: c.cast("double") * scale.cast("double") + rmin.cast("double")
    )


def sq8_max_error(vec: Column) -> Column:
    """max_i |x_i - decode(encode(x))_i| — the per-row reconstruction
    error; bounded by scale/2."""
    rmin, scale = _rmin(vec), _scale(vec)
    rec = F.transform(
        vec,
        lambda x: F.abs(
            x.cast("double")
            - (
                F.floor((x.cast("double") - rmin) / scale + F.lit(0.5))
                * scale
                + rmin
            )
        ),
    )
    return F.array_max(rec)


def sq8_oracle_sql(vec: str = "vector") -> dict[str, str]:
    """DuckDB SQL fragments computing the SAME encode/error arithmetic
    (float64 throughout, floor(x+0.5) rounding) for the oracle twin."""
    rmin = f"CAST(list_min({vec}) AS DOUBLE)"
    raw_s = f"(CAST(list_max({vec}) AS DOUBLE) - {rmin}) / 255.0"
    scale = f"(CASE WHEN {raw_s} > 0 THEN {raw_s} ELSE 1.0 END)"
    codes = (
        f"list_transform({vec}, x -> CAST(floor((CAST(x AS DOUBLE) - {rmin})"
        f" / {scale} + 0.5) AS INT))"
    )
    err = (
        f"list_max(list_transform({vec}, x -> abs(CAST(x AS DOUBLE) - "
        f"(floor((CAST(x AS DOUBLE) - {rmin}) / {scale} + 0.5) * {scale}"
        f" + {rmin}))))"
    )
    return {"rmin": rmin, "scale": scale, "codes": codes, "max_err": err}


def _pack_word_expr(vec_sql: str, start: int, end: int) -> Column:
    """One packed-word aggregate as a single ``F.expr`` parse.

    Semantically identical to the lambda form below (same aggregate /
    sequence / CASE / pow-of-two-cast-BIGINT tree, so bit-identical
    words — pinned by tests/test_quantize.py::test_sign_pack_expr_parity)
    but ONE py4j round trip instead of a py4j lambda registration plus
    per-node Column calls: building the four packing columns of a BQ
    search call cost ~0.14 s of driver wall (cProfile, r13) — pure
    plan-construction latency on every serving batch (guide §5/§7.3)."""
    return F.expr(
        f"aggregate(sequence({start}, {end - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + (CASE WHEN element_at({vec_sql}, "
        f"CAST(i + 1 AS INT)) > 0 THEN CAST(pow(CAST(2.0 AS DOUBLE), "
        f"CAST(i - {start} AS DOUBLE)) AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END))"
    )


def sign_bits_cols(vec: Column | str, dim: int) -> tuple[Column, Column]:
    """1-bit (binary) quantization: the sign pattern of up to 64 dims
    packed into two BIGINT halves (lo = dims 0-31, hi = 32-63) — 32×
    smaller than float32, and hamming distance between signatures is a
    cheap cosine-similarity proxy (two XORs + two bit_counts, pure
    JVM).  Two halves instead of one 64-bit word so no term ever
    touches the sign bit (2^63 overflows signed BIGINT); pow(2, i) is
    exact in doubles for i ≤ 31.  Same packing as a Python-side
    ``sum(1 << i for i where v[i] > 0)`` split at bit 32.

    ``vec`` as a plain column NAME takes the single-parse ``F.expr``
    fast path (identical packing tree, ~6× cheaper to build — see
    `_pack_word_expr`); a Column keeps the original lambda form for
    computed-column callers."""
    if dim > 64:
        raise ValueError("sign_bits_cols packs at most 64 dims")

    if isinstance(vec, str):
        # escape embedded backticks: callers forward user-supplied
        # column names into this SQL string (ADVICE r13)
        vec_sql = f"`{vec.replace('`', '``')}`"

        def half(start: int, end: int) -> Column:
            return _pack_word_expr(vec_sql, start, end)

    else:

        def half(start: int, end: int) -> Column:
            return F.aggregate(
                F.sequence(F.lit(start), F.lit(end - 1)),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.when(
                    F.element_at(vec, (i + 1).cast("int")) > 0,
                    F.pow(
                        F.lit(2.0), (i - start).cast("double")
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            )

    lo_end = min(dim, 32)
    lo = half(0, lo_end)
    hi = half(32, dim) if dim > 32 else F.lit(0).cast("long")
    return lo, hi


def sign_bits_py(vec) -> tuple[int, int]:
    """Driver-side twin of `sign_bits_cols` for literal query vectors."""
    lo = sum(1 << i for i in range(min(len(vec), 32)) if vec[i] > 0)
    hi = sum(1 << (i - 32) for i in range(32, min(len(vec), 64)) if vec[i] > 0)
    return lo, hi


def hamming_col(lo_a: Column, hi_a: Column, lo_b: Column, hi_b: Column) -> Column:
    """Hamming distance between two packed sign signatures."""
    return F.bit_count(lo_a.bitwiseXOR(lo_b)) + F.bit_count(
        hi_a.bitwiseXOR(hi_b)
    )


# bits packed per BIGINT word in the wide (ARRAY<BIGINT>) signature:
# bit i is CAST(pow(2.0, i) AS BIGINT) — exact for i <= 62 (powers of
# two are exact doubles; 2^62 < 2^63-1), and staying below bit 62 keeps
# every word positive so the Python/DuckDB twins never see sign wrap
BQ_WORD_BITS = 62


def _n_words(dim: int) -> int:
    return -(-dim // BQ_WORD_BITS)


def sign_words_col(vec: Column | str, dim: int) -> Column:
    """Wide 1-bit signature: sign pattern of ``dim`` dims packed into
    ``ceil(dim/62)`` BIGINT words (ARRAY<BIGINT>) — the >64-dim
    generalization of `sign_bits_cols` for real embedding widths
    (384-4096).  ~1.03 bits stored per dim, so the hamming candidate
    scan still reads ~31× fewer bytes than float32.  Same per-word
    packing expression as `sign_bits_cols.half` (aggregate over a
    sequence, pow-of-two terms exact in doubles).  A plain column NAME
    takes the single-parse fast path (`_pack_word_expr`); a Column
    keeps the lambda form."""

    if isinstance(vec, str):
        # escape embedded backticks (same hardening as sign_bits_cols)
        vec_sql = f"`{vec.replace('`', '``')}`"

        def word(start: int, end: int) -> Column:
            return _pack_word_expr(vec_sql, start, end)

    else:

        def word(start: int, end: int) -> Column:
            return F.aggregate(
                F.sequence(F.lit(start), F.lit(end - 1)),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.when(
                    F.element_at(vec, (i + 1).cast("int")) > 0,
                    F.pow(
                        F.lit(2.0), (i - start).cast("double")
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            )

    return F.array(
        *(
            word(w * BQ_WORD_BITS, min(dim, (w + 1) * BQ_WORD_BITS))
            for w in range(_n_words(dim))
        )
    )


def sign_words_py(vec, dim: int | None = None) -> list[int]:
    """Driver-side twin of `sign_words_col` for literal query vectors."""
    dim = len(vec) if dim is None else dim
    return [
        sum(
            1 << (i - start)
            for i in range(start, min(dim, start + BQ_WORD_BITS))
            if vec[i] > 0
        )
        for start in range(0, dim, BQ_WORD_BITS)
    ]


def sign_words_sql(vec: str, dim: int) -> str:
    """DuckDB twin of `sign_words_col`: a LIST(BIGINT) expression with
    the identical per-word packing."""

    def word(start: int, end: int) -> str:
        terms = (
            f"CASE WHEN {vec}[i] > 0 THEN "
            f"CAST(pow(2, i - {start + 1}) AS BIGINT) ELSE 0 END"
        )
        return (
            f"CAST(list_sum([{terms} for i in "
            f"range({start + 1}, {end + 1})]) AS BIGINT)"
        )

    words = ", ".join(
        word(w * BQ_WORD_BITS, min(dim, (w + 1) * BQ_WORD_BITS))
        for w in range(_n_words(dim))
    )
    return f"[{words}]"


def hamming_words_col(a: Column, b: Column) -> Column:
    """Hamming distance between two ARRAY<BIGINT> signatures: XOR +
    bit_count per word, summed — pure JVM higher-order functions, no
    UDF, so the candidate scan stays in codegen at any width."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def hamming_words_unrolled_col(a: Column, b: Column, n_words: int) -> Column:
    """`hamming_words_col` with the word loop UNROLLED at plan-build
    time (the word count is known from ``dim``): a fixed
    bit_count(xor) + ... + bit_count(xor) chain.  Identical integers —
    the fold form is ((0 + t1) + t2) + ...; integer addition is exact,
    so dropping the leading 0 changes nothing — but the chain is plain
    codegen arithmetic while aggregate/zip_with higher-order functions
    are CodegenFallback, evaluated interpreted per candidate row
    (r13 optimization, guide §4.1: prefer built-ins that codegen)."""
    terms = [
        F.bit_count(
            F.element_at(a, i + 1).bitwiseXOR(F.element_at(b, i + 1))
        )
        for i in range(n_words)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming_words_sql(sig: str, qwords: list[int]) -> str:
    """DuckDB twin of `hamming_words_col` against a literal query
    signature (1-indexed list access)."""
    return " + ".join(
        f"bit_count(xor({sig}[{i + 1}], CAST({w} AS BIGINT)))"
        for i, w in enumerate(qwords)
    )


def sign_bits_sql(vec: str, dim: int) -> tuple[str, str]:
    """DuckDB twins of `sign_bits_cols` (same exact packing)."""
    if dim > 64:
        raise ValueError("sign_bits_sql packs at most 64 dims")

    def half(start: int, end: int) -> str:
        terms = (
            f"CASE WHEN {vec}[i] > 0 THEN "
            f"CAST(pow(2, i - {start + 1}) AS BIGINT) ELSE 0 END"
        )
        return (
            f"CAST(list_sum([{terms} for i in "
            f"range({start + 1}, {end + 1})]) AS BIGINT)"
        )

    lo = half(0, min(dim, 32))
    hi = half(32, dim) if dim > 32 else "CAST(0 AS BIGINT)"
    return lo, hi


def sq8_encode_table(
    df, vec_col: str = "vector", keep_vector: bool = False
):
    """Encode a vector table into its SQ8 columnar form: ``vec_col`` is
    replaced by (``{vec}_codes``, ``{vec}_rmin``, ``{vec}_scale``)
    columns.  The per-row range params travel WITH the rows, so the
    table is self-describing — any later session (or engine) can decode
    with no side-channel artifact, which is the catalog story for this
    codec (contrast PQ, whose trained codebooks need
    ``operators.pq.save_pq``).  Pure column expressions; write the
    result with plain ``.write.parquet``."""
    v = F.col(vec_col)
    out = df.withColumns(
        {
            f"{vec_col}_codes": sq8_encode(v),
            f"{vec_col}_rmin": _rmin(v),
            f"{vec_col}_scale": _scale(v),
        }
    )
    return out if keep_vector else out.drop(vec_col)


def bq_encode_table(
    df, dim: int, vec_col: str = "vector", id_col: str = "id",
    keep_vector: bool = False,
):
    """Materialize the 1-bit signature table: (id, {vec}_sig_lo,
    {vec}_sig_hi) — two BIGINTs per row, 32× smaller than the float32
    vector column.  Write it with plain ``.write.parquet`` and hand it
    to ``knn_binary(..., sig_table=...)``: the hamming candidate scan
    then reads 16 bytes/row instead of decoding floats and packing
    signatures on the fly — at 100 TB the scan IS the cost, so this is
    the artifact that makes the "32× smaller scan" claim literal.

    dim > 64 stores the wide layout instead: (id, {vec}_sig) with the
    `sign_words_col` ARRAY<BIGINT> signature.  Both layouts also stamp
    a ``{vec}_sig_dim`` column so `knn_binary` can verify at search
    time that the stored signatures were packed at the query dim — a
    dim-32 table searched at dim 64 would otherwise silently degrade
    recall."""
    if dim <= 0:
        raise ValueError(f"bq_encode_table: dim must be positive, got {dim}")
    if dim <= 64:
        lo, hi = sign_bits_cols(vec_col, dim)
        cols = {f"{vec_col}_sig_lo": lo, f"{vec_col}_sig_hi": hi}
    else:
        cols = {f"{vec_col}_sig": sign_words_col(vec_col, dim)}
    cols[f"{vec_col}_sig_dim"] = F.lit(dim).cast("int")
    out = df.withColumns(cols)
    if keep_vector:
        return out
    return out.select(id_col, *cols)


def sq8_decode_table(df, vec_col: str = "vector"):
    """Inverse of `sq8_encode_table`: reconstructs ``vec_col`` (float64
    within scale/2 of the original) from the codes+params columns and
    drops them."""
    out = df.withColumn(
        vec_col,
        sq8_decode(
            F.col(f"{vec_col}_codes"),
            F.col(f"{vec_col}_rmin"),
            F.col(f"{vec_col}_scale"),
        ),
    )
    return out.drop(f"{vec_col}_codes", f"{vec_col}_rmin", f"{vec_col}_scale")
