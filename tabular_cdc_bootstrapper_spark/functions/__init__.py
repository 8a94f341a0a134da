from tabular_cdc_bootstrapper_spark.functions.text import (  # noqa: F401
    LANG_MARKERS,
    with_lang_guess,
    with_text_stats,
)
from tabular_cdc_bootstrapper_spark.functions.dedup import (  # noqa: F401
    exact_dedup_groups,
    minhash_candidates,
    minhash_signature,
    shingle_tokens,
    verified_near_duplicates,
)
from tabular_cdc_bootstrapper_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    lsh_bucketed_topk,
)
from tabular_cdc_bootstrapper_spark.functions.clustering import (  # noqa: F401
    kmeans_fit_predict,
)
