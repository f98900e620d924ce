"""Evaluation harness (reference: lightrag/evaluation/ + reproduce/).

Three faces, all Spark-first and offline-runnable:

- retrieval_check: deterministic TF-IDF lexical retrieval audit
  (recall@k + MRR vs an oracle), the Spark re-expression of
  lightrag/evaluation/offline_retrieval_check.py.
- rag_quality: RAGAS-shaped per-case metric evaluation with a pluggable
  metrics fn (lightrag/evaluation/eval_rag_quality.py semantics: NaN-excluded
  ragas_score average, benchmark stats).
- pairwise: two-system win-rate judging with the reference's verbatim
  criteria prompt (reproduce/batch_eval.py).
"""

from .retrieval_check import (  # noqa: F401
    STOPWORDS,
    doc_term_frequencies,
    inverse_document_frequency,
    ndcg_at_k,
    rank_documents,
    retrieval_metrics,
    summarize_retrieval,
)
from .rag_quality import (  # noqa: F401
    RAGAS_METRICS,
    benchmark_stats,
    evaluate_cases,
    lexical_metrics_fn,
)
from .pairwise import (  # noqa: F401
    PAIRWISE_CRITERIA,
    build_pairwise_prompt,
    judge_pairs,
    pairwise_sys_prompt,
    win_rates,
)
