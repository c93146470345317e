from graphlite_spark.functions.hashes import hash48, md5_concat  # noqa: F401
from graphlite_spark.functions.text import (  # noqa: F401
    STOPWORDS,
    fingerprint_expr,
    lang_id_expr,
    quality_exprs,
    shingles_expr,
    tokens_expr,
)
