"""Worker process for tests/test_distributed.py: bring up jax.distributed
from SEQALIGN_* env, score the shared input file, print the gathered result.
Run as: python tests/_dist_worker.py <file.fa> [--sw]"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu.parallel.distributed import (  # noqa: E402
    distributed_align_file,
    distributed_score_file,
    init_from_env,
)
from seqalign_tpu.scoring.presets import (  # noqa: E402
    scoring_system_default,
    scoring_system_sw_default,
)


def main():
    path = sys.argv[1]
    is_sw = "--sw" in sys.argv
    align = "--align" in sys.argv
    multi = init_from_env()
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    out = {"multi": multi,
           "pid": int(os.environ.get("SEQALIGN_PROC_ID", "0"))}
    if align:
        res = distributed_align_file(sc, path, is_sw=is_sw, batch=4)
        if is_sw:
            out["alns"] = [[(h.result_a, h.result_b, int(h.score),
                             int(h.pos_a), int(h.pos_b)) for h in hits]
                           for hits in res]
        else:
            out["alns"] = [(r.result_a, r.result_b, int(r.score))
                           for r in res]
    else:
        scores = distributed_score_file(sc, path, is_sw=is_sw, batch=4)
        out["scores"] = [int(s) for s in scores]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
