"""Entity resolution over extracted contact identifiers.

The curation op that exact/near dedup cannot express: two documents are
the SAME logical entity (author page, org profile, mirrored contact
card) when they share a hard identifier — an email address or a phone
number — even if their text is otherwise unrelated.  Resolution is the
connected components of the doc–identifier bipartite graph, restricted
to identifiers that are actually discriminating:

* **extraction** — ``regexp_extract_all`` with the PII dialect patterns
  (operators/pii.py: the Java-regex/RE2 common subset, so Spark and the
  DuckDB oracle extract bit-identically), lowercased and type-prefixed
  (``email:…`` / ``phone:…``) so an email can never collide with a
  phone string.
* **stop-identifiers** — an identifier appearing in more than ``max_df``
  documents (the org-wide ``info@`` address, the switchboard number) is
  dropped, exactly the stop-shingle discipline the dedup tier uses: a
  mega-identifier would otherwise glue unrelated docs into one blob AND
  is the hub-skew axis.  df == 1 identifiers create no edge (singleton).
* **star edges, not cliques** — each surviving identifier contributes
  ``df - 1`` edges (every holder → the identifier's min doc_id), linear
  in group size where the clique would be quadratic; connectivity (and
  hence the components) is identical.
* **clustering** — ``connected_components_fast`` (the O(log d)
  label-doubling engine) over the star edges; the entity id is the min
  doc_id of the group, so unmatched docs keep their own id.

Scale shape: extraction is a zero-shuffle codegen projection; the ident
table is output-linear; one groupBy(ident) (map-side combined, hub-free
by the df cap) + one equi-join build the stars; CC runs on a pair graph
that is tiny relative to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.operators.pii import PII_PATTERNS

#: (type, pattern) — the identifier subset of the PII dialect table
IDENT_PATTERNS: tuple[tuple[str, str], ...] = tuple(
    (name, pat) for name, pat, _ in PII_PATTERNS if name in ("email", "phone")
)


def extract_identifiers(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, ident) — distinct typed identifiers per document."""
    parts = []
    for name, pat in IDENT_PATTERNS:
        hits = docs.select(
            F.col(id_col).alias("doc_id"),
            # idx=0 = whole match, the same default DuckDB's
            # regexp_extract_all uses (Spark's default is group 1)
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)).alias(
                "xs"
            ),
        )
        # explode cannot nest inside another expression — separate select
        ex = hits.select("doc_id", F.explode("xs").alias("x"))
        parts.append(
            ex.select(
                "doc_id",
                F.concat(F.lit(f"{name}:"), F.lower(F.col("x"))).alias("ident"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def entity_resolution(
    docs: DataFrame,
    max_df: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, entity) — transitive closure over shared identifiers;
    ``entity`` is the min doc_id of the group (own id if unmatched)."""
    from graphlite_spark.algos.components import connected_components_fast

    idents = extract_identifiers(docs, text_col=text_col, id_col=id_col)
    g = idents.groupBy("ident").agg(
        F.min("doc_id").alias("m"), F.count(F.lit(1)).alias("df")
    )
    g = g.where((F.col("df") >= 2) & (F.col("df") <= max_df))
    stars = (
        idents.join(g, "ident")
        .where(F.col("doc_id") != F.col("m"))
        .select(
            F.col("m").alias("src"),
            F.col("doc_id").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    verts = docs.select(F.col(id_col).alias("id"))
    cc = connected_components_fast(verts, stars)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("entity")
    )
