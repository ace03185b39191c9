
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, time
from nfai_tpu.utils.jax_setup import enable_persistent_cache
enable_persistent_cache()
from nfai_tpu.models import llama
for hd, hq, hkv in [(128, 24, 8), (64, 32, 8)]:
    try:
        t0=time.time()
        q = jnp.ones((8, 1, hq, hd), jnp.bfloat16)
        k = jnp.ones((hkv, 8, 1024, hd), jnp.bfloat16)
        v = jnp.ones((hkv, 8, 1024, hd), jnp.bfloat16)
        pos = jnp.full((8, 1), 100, jnp.int32)
        llama.DECODE_ATTN_IMPL = "paged"
        out = np.asarray(llama._cached_attention(q, k, v, pos))
        print(f"hd={hd}: OK {out.shape} in {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"hd={hd}: FAIL {str(e)[:150]}", flush=True)
