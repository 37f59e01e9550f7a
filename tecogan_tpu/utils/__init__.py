"""Utilities: logging, parameter introspection, summaries, profiling."""

from tecogan_tpu.utils.logging import Tee, param_summary
from tecogan_tpu.utils.summaries import SummaryLogger, encode_gif

__all__ = ["Tee", "param_summary", "SummaryLogger", "encode_gif"]
