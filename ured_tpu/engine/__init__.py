"""Entry points: training, evaluation, retrieval."""
