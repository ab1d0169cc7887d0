r"""Boilerplate removal: extract main content from HTML block structure.

Every public webtext pipeline (C4, CCNet, RefinedWeb, Dolma) strips nav
bars / footers / ad blocks before quality filtering — the public
reference algorithms are jusText (Pomikalek 2011: block-level link
density + stopword density) and trafilatura. This operator implements the
jusText core as pure codegen column work: split HTML into block-element
segments, score each block (text length, words, link density), keep
content blocks, reassemble in document order. The Ruby reference extracts
fixed fields from known selectors (cars_controller.rb:151-240) and never
needs generic boilerplate removal; this is the L31 row of the
LLM-training-data family (SURVEY §2.10).

Per-block features:
- text     = block with inline tags stripped, whitespace collapsed
- n_words  = whitespace token count of that text
- link_chars = total length of <a>...</a> inner texts (BEFORE stripping)
- link_density = link_chars / max(text_chars, 1)  (integer ratio, only
  ever compared against a rational threshold — the comparison
  link_chars * den <= text_chars * num is done in exact integer
  arithmetic so the keep/drop verdict is bit-identical in any engine)

Keep rule (jusText "good" simplified): n_words >= min_words AND
link_density <= max_link_density. Dropped: short blocks (nav crumbs,
buttons), link-dense blocks (menus, footers, ad clusters).

Scale: embarrassingly parallel per document, no shuffle at all — split,
transform, filter, array_join inside one codegen stage. At 100 TB this
runs at scan speed; that is the whole point of choosing jusText's
features over a DOM parse (a per-row Python HTML parser would be the
pipeline's bottleneck).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOCK_SPLIT_RE = r"</?(?:p|div|nav|footer|header|aside|section|article|ul|ol|li|h[1-6]|table|tr|td|br)\b[^>]*>"
_A_INNER = r"(?s)<a\b[^>]*>(.*?)</a>"
_TAG = r"(?s)<[^>]*>"


def _block_text(block: Column) -> Column:
    return F.trim(F.regexp_replace(F.regexp_replace(block, _TAG, " "), r"\s+", " "))


def _link_chars(block: Column) -> Column:
    inner = F.regexp_extract_all(block, F.lit(_A_INNER), 1)
    stripped = F.transform(inner, lambda x: _block_text(x))
    return F.aggregate(
        stripped, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def html_blocks(docs: DataFrame, id_col: str = "doc_id", html_col: str = "html") -> DataFrame:
    """Explode HTML into scored block rows: (doc_id, block_pos, text,
    n_words, text_chars, link_chars). Empty blocks are dropped."""
    blocks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(html_col), BLOCK_SPLIT_RE)).alias("block_pos", "block"),
    )
    txt = _block_text(F.col("block"))
    return (
        blocks.select(
            "doc_id",
            F.col("block_pos").cast("long").alias("block_pos"),
            txt.alias("text"),
            F.size(F.split(txt, r"\s+")).cast("long").alias("n_words"),
            F.length(txt).cast("long").alias("text_chars"),
            _link_chars(F.col("block")).alias("link_chars"),
        )
        .filter(F.col("text") != "")
    )


def strip_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_words: int = 5,
    max_link_density_num: int = 2,
    max_link_density_den: int = 5,
) -> DataFrame:
    """Main-content extraction: (doc_id, n_blocks, n_kept, main_text).

    The link-density threshold is the rational num/den (default 2/5 = 0.4)
    compared in integer cross-multiplication — no floating point anywhere,
    so verdicts and the reassembled main_text replay exactly in SQL.
    Documents whose every block is boilerplate yield main_text = ''.
    """
    b = html_blocks(docs, id_col, html_col)
    keep = (F.col("n_words") >= min_words) & (
        F.col("link_chars") * F.lit(max_link_density_den)
        <= F.col("text_chars") * F.lit(max_link_density_num)
    )
    scored = b.withColumn("keep", keep)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("block_pos", "text"))
                        )
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("main_text"),
        )
    )
