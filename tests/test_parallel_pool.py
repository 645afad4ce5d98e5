"""ParallelExecutor / parallel_map behavior, incl. runner-cache lifecycle."""
import numpy as np

from lhotse_tpu.parallel.pool import ParallelExecutor, parallel_map


class _CountingRunner:
    instances = 0

    def __init__(self):
        type(self).instances += 1

    def __call__(self, x):
        return x * 2


class TestParallelMap:
    def test_ordered_streaming(self):
        assert list(
            parallel_map(lambda x: x + 1, range(50), num_jobs=4, threads=True)
        ) == list(range(1, 51))


class TestParallelExecutor:
    def test_threads_mode_results(self):
        ex = ParallelExecutor(_CountingRunner, num_jobs=2, threads=True)
        assert sorted(ex(range(10))) == [x * 2 for x in range(10)]

    def test_runner_cache_evicted_after_iteration(self):
        """Per-executor runners must not leak: once the generator finishes,
        the executor's entries disappear from every cache (thread-local and
        process-level)."""
        ex = ParallelExecutor(_CountingRunner, num_jobs=2, threads=True)
        list(ex(range(8)))
        token = ex._runner_token
        assert token not in ParallelExecutor._process_runners
        for cache in ParallelExecutor._thread_caches:
            assert token not in cache

    def test_runner_cache_evicted_on_abandoned_generator(self):
        ex = ParallelExecutor(_CountingRunner, num_jobs=1, threads=True)
        gen = ex(range(100))
        next(gen)
        gen.close()
        token = ex._runner_token
        for cache in ParallelExecutor._thread_caches:
            assert token not in cache

    def test_distinct_executors_do_not_share_runners(self):
        before = _CountingRunner.instances
        ex1 = ParallelExecutor(_CountingRunner, num_jobs=1, threads=True)
        list(ex1(range(3)))
        ex2 = ParallelExecutor(_CountingRunner, num_jobs=1, threads=True)
        list(ex2(range(3)))
        assert _CountingRunner.instances >= before + 2
