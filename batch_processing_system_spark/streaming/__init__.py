from .windows import sessionized_counts, sliding_counts, tumbling_counts

__all__ = ["sessionized_counts", "sliding_counts", "tumbling_counts"]
