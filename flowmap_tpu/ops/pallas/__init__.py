from .correlation import global_correlation_expectation, softmax_expectation

__all__ = ["global_correlation_expectation", "softmax_expectation"]
