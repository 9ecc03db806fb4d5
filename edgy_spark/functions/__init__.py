from edgy_spark.functions.exact import dec, one, to_dbl
from edgy_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["dec", "one", "to_dbl", "cosine_similarity", "dot", "l2_norm"]
