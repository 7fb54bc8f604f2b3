"""GPT-style sequence packing: concatenate documents in a deterministic
order and chop into fixed-token-length training sequences.

The standard LM-pretraining data op (packing with document boundaries):
documents are laid end-to-end and cut every ``seq_len`` tokens; a document
that crosses a cut contributes a fragment to each side. The output is the
*pack manifest* — one row per (sequence, document-fragment) with the
fragment's offset inside the document and inside the sequence — which is
exactly what a downstream tokenizer/loader needs to materialize training
rows, and is small (rows ≈ docs + sequences) compared to the token stream
itself.

Scale design (10^12 documents):
* NO global sort. Documents are hash-assigned to ``n_buckets`` independent
  packing streams with pure integer arithmetic (same law as the repo's
  derived-geo tables, bit-identical in DuckDB), and the running token
  offset is a window cumsum PARTITIONED BY bucket — each bucket packs
  independently, so the only shuffle is a bucket-keyed repartition and the
  per-task state is one bucket's cumsum. At corpus scale dial
  ``n_buckets`` to ~#cores*4 (each bucket yields its own sequence-id
  space, so buckets never coordinate).
* Fragments are emitted with ``sequence()`` + ``explode`` (a document
  spanning F sequence boundaries emits F+1 rows) — pure codegen, no UDF.
* Deterministic end-to-end: bucket assignment, intra-bucket order
  (``id_col``), and cuts are all integer arithmetic, so re-running a
  failed partition reproduces identical sequences (checkpoint/resume
  safe), and the DuckDB twin reproduces it bit-for-bit.

Sequence fullness invariant: within a bucket every sequence except the
last holds exactly ``seq_len`` tokens; empty documents (0 tokens) pack
nothing and are absent from the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as T

# bucket hash law: same multiplier/modulus family as queries._pts so the
# oracle twin is plain BIGINT arithmetic on both engines
_PB, _MB = 2_654_435_761, 2_147_483_647
# sequences per bucket headroom for the composite seq_id; a bucket would
# need >1e9 * seq_len tokens to overflow it
_SEQ_SPACE = 1_000_000_000


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Pack manifest for fixed-length sequence training data.

    Returns one row per (sequence, document-fragment):
      ``bucket``     — independent packing stream the doc hashed into
      ``seq_id``     — bucket * 1e9 + sequence index within the bucket
      ``doc_id``     — the document (``id_col``)
      ``doc_offset`` — fragment start, in tokens, inside the document
      ``seq_offset`` — fragment start, in tokens, inside the sequence
      ``frag_tokens``— fragment length in tokens

    ``tokens_col`` supplies a precomputed token count; otherwise tokens
    are counted with the repo's normalized whitespace tokenizer
    (functions.text.token_count) so the DuckDB twin stays bit-identical.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n_tok = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else T.token_count(text_col)
    )
    ids = F.col(id_col).cast("long")
    toks = docs.select(
        ids.alias("doc_id"),
        n_tok.alias("n_tokens"),
        (((ids * F.lit(_PB)) % F.lit(_MB)) % F.lit(n_buckets)).alias("bucket"),
    ).where(F.col("n_tokens") > 0)
    # running token offset per bucket: the ONLY wide op, and it is
    # bucket-partitioned (no global order)
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum = toks.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum"),
    ).withColumn("start", F.col("cum") - F.col("n_tokens"))
    # a doc spans sequences floor(start/L) .. floor((cum-1)/L); integer
    # DIV keeps the arithmetic exact at any offset
    frags = cum.withColumn(
        "k",
        F.explode(
            F.sequence(
                F.expr(f"start DIV {seq_len}"),
                F.expr(f"(cum - 1) DIV {seq_len}"),
            )
        ),
    )
    cut_lo = F.greatest(F.col("start"), F.col("k") * F.lit(seq_len))
    cut_hi = F.least(F.col("cum"), (F.col("k") + 1) * F.lit(seq_len))
    return frags.select(
        "bucket",
        (F.col("bucket") * F.lit(_SEQ_SPACE) + F.col("k")).alias("seq_id"),
        "doc_id",
        (cut_lo - F.col("start")).alias("doc_offset"),
        (cut_lo - F.col("k") * F.lit(seq_len)).alias("seq_offset"),
        (cut_hi - cut_lo).alias("frag_tokens"),
    )


def pack_sequences_sql(
    seq_len: int,
    n_buckets: int = 1024,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pack_sequences` (token_count_sql tokenizer)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         {T.token_count_sql(text_col)} AS n_tokens,
         (({id_col} * {_PB}) % {_MB}) % {n_buckets} AS bucket
  FROM {table}
), cums AS (
  -- DuckDB SUM(BIGINT) yields HUGEINT; cast back so range()/arithmetic
  -- below stay in BIGINT like the Spark side
  SELECT doc_id, bucket, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS cum
  FROM toks WHERE n_tokens > 0
), spans AS (
  SELECT doc_id, bucket, n_tokens, cum, cum - n_tokens AS start
  FROM cums
), frags AS (
  SELECT doc_id, bucket, cum, start,
         unnest(range(start // {seq_len}, (cum - 1) // {seq_len} + 1)) AS k
  FROM spans
)
SELECT bucket,
       bucket * {_SEQ_SPACE} + k AS seq_id,
       doc_id,
       GREATEST(start, k * {seq_len}) - start AS doc_offset,
       GREATEST(start, k * {seq_len}) - k * {seq_len} AS seq_offset,
       LEAST(cum, (k + 1) * {seq_len}) - GREATEST(start, k * {seq_len})
         AS frag_tokens
FROM frags
"""


# ---------------------------------------------------------------------------
# sliding-window document chunking (RAG / embedding prep)
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunk manifest + text: the retrieval-side sibling of
    :func:`pack_sequences` (packing concatenates docs for LM training;
    chunking windows WITHIN each doc for embedding/RAG indexes).

    Chunks start every ``stride = chunk_tokens - overlap`` tokens at
    0, stride, 2*stride, ...; every chunk holds ``chunk_tokens`` tokens
    except the last, which is cut at the document end (and always
    contains at least one token past the previous chunk). Tokenization
    is the repo's normalized whitespace law (functions.text.tokens), so
    the DuckDB twin is bit-identical. Empty documents emit no chunks.

    Returns ``(doc_id, chunk_idx, tok_start, tok_end, chunk_text)``
    with token coordinates half-open ``[tok_start, tok_end)``.

    Plan shape (100 TB lens): pure per-row codegen — tokens ride the
    scan, the chunk index list is ``sequence()`` + ``explode`` and the
    text is an ``array_join(slice(...))``; there is NO shuffle at all
    (contrast pack_sequences' one bucket-keyed window). Fan-out is
    n_tokens/stride rows per doc, bounded by the same token count the
    scan already materializes.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    t = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        T.tokens(text_col).alias("ws"),
        T.token_count(text_col).alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    m = F.lit(1) + F.when(
        F.col("n_tok") > chunk_tokens,
        F.expr(f"(n_tok - {chunk_tokens} + {stride} - 1) DIV {stride}"),
    ).otherwise(F.lit(0))
    j = t.withColumn("j", F.explode(F.sequence(F.lit(0), m - 1)))
    tok_start = F.col("j") * F.lit(stride)
    tok_end = F.least(tok_start + F.lit(chunk_tokens), F.col("n_tok"))
    return j.select(
        "doc_id",
        F.col("j").alias("chunk_idx"),
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        F.array_join(
            F.slice(F.col("ws"), tok_start + F.lit(1), tok_end - tok_start), " "
        ).alias("chunk_text"),
    )


def chunk_documents_sql(
    docs_sql: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (`//` == Spark's DIV on the
    non-negative operands here). ``docs_sql`` must yield (doc_id, text)."""
    stride = chunk_tokens - overlap
    return f"""WITH ch_docs AS ({docs_sql}),
ch_tok AS (
  SELECT doc_id, {T.tokens_sql('text')} AS ws, {T.token_count_sql('text')} AS n_tok
  FROM ch_docs
),
ch_j AS (
  SELECT doc_id, ws, n_tok,
         unnest(range(0, 1 + CASE WHEN n_tok > {chunk_tokens}
           THEN (n_tok - {chunk_tokens} + {stride} - 1) // {stride}
           ELSE 0 END)) AS j
  FROM ch_tok WHERE n_tok > 0
)
SELECT doc_id, j AS chunk_idx, j * {stride} AS tok_start,
       least(j * {stride} + {chunk_tokens}, n_tok) AS tok_end,
       array_to_string(list_slice(ws, j * {stride} + 1,
         least(j * {stride} + {chunk_tokens}, n_tok)), ' ') AS chunk_text
FROM ch_j"""
