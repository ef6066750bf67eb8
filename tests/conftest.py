"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the driver validates real multi-chip separately via
__graft_entry__.dryrun_multichip).

Forcing CPU takes three steps on an axon-tunnel machine because the
``/root/.axon_site/sitecustomize.py`` hook registers the TPU plugin at
interpreter start and writes ``jax_platforms=axon,cpu`` straight into the
jax config (env vars alone cannot win):

* ``PALLAS_AXON_POOL_IPS=""`` — stops the sitecustomize hook in every
  *subprocess* tests spawn (CLI byte-parity runs, Perl wrappers, the
  multi-process distributed test).  Only one process may hold the TPU
  tunnel; tests must never touch it.
* ``JAX_PLATFORMS=cpu`` — normal env selection for subprocesses.
* ``jax.config.update("jax_platforms", "cpu")`` — overrides the config the
  sitecustomize hook already wrote into *this* process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


# The XLA CPU backend's LLVM JIT occasionally segfaults inside
# backend_compile after ~1400 jit compilations in one process (observed
# twice in round 4, different tests each time, always late in the suite,
# 125GB RAM free — not OOM).  Periodically dropping the executable caches
# bounds the JIT arena and has eliminated the crash in repeated full runs;
# the recompile cost is a few seconds over the whole suite.
_TESTS_BETWEEN_CACHE_CLEARS = 200
_test_counter = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    _test_counter["n"] += 1
    if _test_counter["n"] % _TESTS_BETWEEN_CACHE_CLEARS == 0:
        jax.clear_caches()
