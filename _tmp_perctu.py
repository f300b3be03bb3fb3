import functools
import numpy as np, jax, jax.numpy as jnp
from hevc_tpu.pipeline import psearch, search as search_lib

rng = np.random.RandomState(3)
ref_y = rng.randint(0, 256, (64, 128)).astype(np.uint8)
cur_y = np.roll(ref_y, (1, 2), axis=(0, 1)).copy()
cur_y[8:40, 70:110] = rng.randint(0, 256, (32, 40))
cb = np.full((32, 64), 128, np.uint8)
origins = jnp.asarray(search_lib.ctu_grid(128, 64))
args = (cur_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        ref_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32), origins)
qp_set = (30, 32, 34)
scalar = jax.jit(functools.partial(psearch.p_search_frame, pad_w=128, pad_h=64, qp_set=qp_set))
vec = jax.jit(functools.partial(psearch.p_search_frame, pad_w=128, pad_h=64, qp_set=qp_set))
a = scalar(*args, qp=jnp.int32(32))
b = vec(*args, qp=jnp.full((2,), 32, jnp.int32))
for name in a._fields:
    np.testing.assert_array_equal(np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name)
print("uniform-vector == scalar OK")
c = vec(*args, qp=jnp.asarray([30, 34], jnp.int32))
print("mixed qp depth8:", np.asarray(c.depth8).max(), "coef nz:", int((np.asarray(c.coef_y)!=0).sum()))
d30 = scalar(*args, qp=jnp.int32(30))
d34 = scalar(*args, qp=jnp.int32(34))
np.testing.assert_array_equal(np.asarray(c.coef_y)[0], np.asarray(d30.coef_y)[0], err_msg="ctu0@30")
np.testing.assert_array_equal(np.asarray(c.coef_y)[1], np.asarray(d34.coef_y)[1], err_msg="ctu1@34")
print("per-CTU == per-frame slice-wise OK")
