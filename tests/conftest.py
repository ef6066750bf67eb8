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


# The XLA CPU backend's LLVM JIT occasionally segfaults/aborts inside
# backend_compile after many jit compilations in one process (observed
# in rounds 4 and 5, always in a LATER compile — typically the big
# 8-shard shard_map graphs of test_parallel — with 120GB RAM free; not
# OOM, and round-5 bisects ruled out stack exhaustion: it reproduces
# with ulimit -s unlimited).  Dropping the executable caches bounds the
# JIT arena and eliminates the crash — but the round-4 every-200-tests
# counter was POSITIONAL: adding tests moved the clear boundary away
# from the shard-map compiles and the crash returned (deterministic in
# a pallas+pallas2+parallel 3-file run).  Clear at every module
# boundary instead (order-independent; recompile cost is a few seconds
# over the whole suite), plus the counter as a backstop within huge
# modules.
_TESTS_BETWEEN_CACHE_CLEARS = 200
_test_counter = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    _test_counter["n"] += 1
    if nextitem is not None and \
            item.module is not getattr(nextitem, "module", None):
        _test_counter["n"] = 0
        jax.clear_caches()
    elif _test_counter["n"] % _TESTS_BETWEEN_CACHE_CLEARS == 0:
        jax.clear_caches()
