from .correlation import global_correlation_expectation

__all__ = ["global_correlation_expectation"]
