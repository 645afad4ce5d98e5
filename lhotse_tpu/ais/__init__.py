from lhotse_tpu.ais.batch_loader import (
    AISBatchLoader, AISBatchLoaderError, BatchFetcher, FetchRequest, LocalBatchFetcher,
    collect_batch_requests)
from lhotse_tpu.ais.range_reader import AISRangeReader

__all__ = [
    "AISBatchLoader", "AISBatchLoaderError", "AISRangeReader", "BatchFetcher", "FetchRequest",
    "LocalBatchFetcher", "collect_batch_requests"]
