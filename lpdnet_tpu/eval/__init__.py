"""Retrieval evaluation (reference: ``evaluate.py`` — SURVEY C18)."""

from lpdnet_tpu.eval.recall import get_recall, knn_retrieve
from lpdnet_tpu.eval.evaluate import evaluate_model, format_results

__all__ = ["get_recall", "knn_retrieve", "evaluate_model", "format_results"]
