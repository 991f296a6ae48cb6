"""Pack this host's warm XLA compile cache into the repo-shipped seed.

Run AFTER a full `python bench.py` pass in the target quantize mode(s) so
every bench-stage shape's executable is in the cache (headline B=64 x each
token bucket, the B=1 streaming graphs, the e2e auto-sized batch, whisper
mel+decode). The driver extracts the seed on a fingerprint match
(msa_tpu.utils.jit_cache.extract_seed) and benches warm.

Usage: python tools/make_cache_seed.py [mode ...]   (default: int8)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msa_tpu.utils.jit_cache import cache_dir, make_seed  # noqa: E402


def main():
    modes = sys.argv[1:] or ["int8"]
    seed = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "jit_cache_seed",
    )
    meta = make_seed(seed, modes)
    size = os.path.getsize(os.path.join(seed, "entries.tar.gz"))
    print(json.dumps({**meta, "tar_mb": round(size / 1e6, 1), "src": cache_dir()}))


if __name__ == "__main__":
    main()
