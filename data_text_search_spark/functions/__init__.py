from data_text_search_spark.functions.text import (
    TOKEN_PATTERN,
    clean_expr,
    sha256_expr,
    tokenize_expr,
    tokenize_pandas_udf,
    tokenize_py,
)

__all__ = [
    "TOKEN_PATTERN",
    "clean_expr",
    "sha256_expr",
    "tokenize_expr",
    "tokenize_pandas_udf",
    "tokenize_py",
]
