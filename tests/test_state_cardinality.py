"""Incremental HLL service: wave-merge equals the batch estimate,
wave-order and stripe-count invariance, live estimates between waves."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.state.cardinality import (
    CardinalityService,
    hll_service_distinct,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def docs(texts):
    return rd.from_arrow(pa.table({"text": texts}))


TEXTS = [f"word{i} word{i % 50} shared common tokens" for i in range(300)]


class TestCardinalityService:
    def test_equals_batch_estimate_any_split(self):
        from textalyzer_ray.pipelines.frequency import approx_distinct_words

        batch = approx_distinct_words(docs(TEXTS))
        for n_waves in (1, 3):
            waves = [docs(TEXTS[w::n_waves]) for w in range(n_waves)]
            got = hll_service_distinct(waves)
            assert got == batch, (n_waves, got, batch)

    def test_stripe_count_invariance_and_live_estimates(self):
        svc1 = CardinalityService(n_shards=1)
        svc4 = CardinalityService(n_shards=4)
        try:
            a, b = docs(TEXTS[:150]), docs(TEXTS[150:])
            svc1.add_wave(a)
            svc4.add_wave(a)
            mid1, mid4 = svc1.estimate(), svc4.estimate()
            assert mid1 == mid4 > 0
            svc1.add_wave(b)
            svc4.add_wave(b)
            assert svc1.estimate() == svc4.estimate() >= mid1
        finally:
            svc1.shutdown()
            svc4.shutdown()

    def test_idempotent_reingest(self):
        svc = CardinalityService(n_shards=2)
        try:
            svc.add_wave(docs(TEXTS))
            once = svc.estimate()
            svc.add_wave(docs(TEXTS))  # max-merge: re-ingest is a no-op
            assert svc.estimate() == once
        finally:
            svc.shutdown()

    def test_empty_wave(self):
        svc = CardinalityService(n_shards=2)
        try:
            assert svc.add_wave(docs([])) == 0
            assert svc.estimate() == 0
        finally:
            svc.shutdown()
