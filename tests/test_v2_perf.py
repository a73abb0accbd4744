"""v2 pipeline benchmark harness smoke tests.

Role parity: reference v2/{spring,generalized,positional}/perf_test.py run
the batch=256 x 1000-step benchmark; here small shapes keep single-core CI
fast while still exercising the vmapped-init + scanned-step harness for all
three backends.
"""

import jax
import jax.numpy as jnp
import pytest

from brax_tpu.v2 import test_utils
from brax_tpu.v2.generalized import pipeline as g_pipeline
from brax_tpu.v2.positional import pipeline as p_pipeline
from brax_tpu.v2.spring import pipeline as s_pipeline


def _init_fn(pipeline):
    def init(sys, rng):
        q = sys.init_q + 0.01 * jax.random.normal(rng, (sys.q_size(),))
        return pipeline.init(sys, q, jnp.zeros(sys.qd_size()))

    return init


@pytest.mark.parametrize(
    "name,pipeline",
    [
        ("generalized", g_pipeline),
        ("spring", s_pipeline),
        ("positional", p_pipeline),
    ],
)
def test_benchmark_harness(name, pipeline):
    jit_time, op_time = test_utils.benchmark(
        "single_pendulum",
        _init_fn(pipeline),
        pipeline.step,
        batch_size=8,
        length=16,
    )
    assert op_time > 0
    assert jit_time > 0
