"""Linkage evaluation operators (SURVEY.md §2.8, reference eval.R:4-49).

Counts come from distributed joins (inner = TP, anti both ways = FP-part /
FN); metric arithmetic is driver-side scalars.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class EvalCounts:
    TP: int
    FP: int
    FN: int
    TN: int


def evaluation(pred_matches: DataFrame, true_matches: DataFrame, n: int) -> EvalCounts:
    """TP/FP/FN/TN by pair-set membership (reference eval.R:4-20):
    TN = n − |true| − FP, where n = |Ω|."""
    pred = pred_matches.select("a", "b")
    true = true_matches.select("a", "b")
    n_pred = pred.count()
    n_true = true.count()
    tp = pred.join(true, ["a", "b"], "inner").count()
    fp = n_pred - tp
    fn = n_true - tp  # true pairs absent from pred (pair tables are duplicate-free)
    tn = n - n_true - fp
    return EvalCounts(TP=tp, FP=fp, FN=fn, TN=tn)


def get_metrics(TP: int, FP: int, FN: int, TN: int) -> dict[str, float]:
    """FLR = 1 − precision; MMR = FNR (reference eval.R:25-36)."""
    precision = TP / (TP + FP) if (TP + FP) != 0 else 0.0
    fnr = FN / (FN + TP) if (FN + TP) != 0 else 0.0
    return {"FLR": 1.0 - precision, "MMR": fnr}


def get_confusion(TP: int, FP: int, FN: int, TN: int) -> list[list[int]]:
    """2×2 confusion matrix rows = (Actual Positive, Actual Negative),
    cols = (Predicted Positive, Predicted Negative) (reference eval.R:41-49)."""
    return [[TP, FN], [FP, TN]]


def pairwise_f1(TP: int, FP: int, FN: int) -> float:
    """Pairwise linkage F1 = 2·TP / (2·TP + FP + FN) — the driver's headline
    metric (BASELINE.json)."""
    denom = 2 * TP + FP + FN
    return 2 * TP / denom if denom else 0.0


def blocking_diagnostics(
    true_matches: "DataFrame", candidate_pairs: "DataFrame", full_pairs: int
) -> dict:
    """E4 — recall of true matches preserved by blocking + pair reduction
    (reference internals.R:834-853)."""
    n_true = true_matches.count()
    preserved = true_matches.join(
        candidate_pairs.select("a", "b"), ["a", "b"], "left_semi"
    ).count()
    blocked_pairs = candidate_pairs.count()
    return {
        "true_matches": n_true,
        "preserved_matches": preserved,
        "lost_matches": n_true - preserved,
        "blocking_recall": preserved / n_true if n_true else float("nan"),
        "blocking_fnr": (n_true - preserved) / n_true if n_true else float("nan"),
        "blocked_pairs": blocked_pairs,
        "full_pairs": full_pairs,
    }


def mec_selection_diagnostics(
    M_est: "DataFrame", true_matches: "DataFrame", candidate_pairs: "DataFrame"
) -> dict:
    """E5 — candidate recall and FLR within the candidate space
    (reference internals.R:856-881)."""
    cand_truth = true_matches.join(
        candidate_pairs.select("a", "b"), ["a", "b"], "left_semi"
    )
    n_cand_truth = cand_truth.count()
    n_sel = M_est.count()
    tp = M_est.select("a", "b").join(cand_truth, ["a", "b"], "inner").count()
    return {
        "candidate_true_matches": n_cand_truth,
        "selected": n_sel,
        "candidate_recall": tp / n_cand_truth if n_cand_truth else float("nan"),
        "candidate_flr": 1 - tp / n_sel if n_sel else float("nan"),
    }
