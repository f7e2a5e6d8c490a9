"""Micro-probe: which Pallas/Mosaic load patterns compile on this chip.

Informs the shift-warp backward fix: the failing pattern was a vector.load
of 8 rows at a DYNAMIC unaligned sublane offset of a 3D f32 plane. Candidate
reformulations differ in whether the sliced dim is tiled and whether offsets
are static.
"""
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

H, W = 64, 256


def try_case(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK {float(jnp.sum(out)):.1f}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {msg}", flush=True)


# a) 3D plane, static unaligned sublane ds
def kernel_a(x_ref, o_ref):
    o_ref[...] = x_ref[pl.ds(3, 8), :]


try_case("a_static_sublane_ds_3d", lambda: pl.pallas_call(
    kernel_a, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
)(jnp.ones((H, W), jnp.float32)))


# b) 4D: rows untiled dim1, params in sublanes; static single-sublane index
def kernel_b(x_ref, o_ref):
    o_ref[...] = x_ref[pl.ds(3, 8), 1, :]


try_case("b_untiled_row_single_sublane", lambda: pl.pallas_call(
    kernel_b, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
)(jnp.ones((H, 8, W), jnp.float32)))


# c) 4D: rows untiled, full sublane tile load then value-index sublane 0
def kernel_c(x_ref, o_ref):
    v = x_ref[pl.ds(3, 8), pl.ds(0, 8), :]
    o_ref[...] = v[:, 0, :]


try_case("c_untiled_row_tile_then_value_index", lambda: pl.pallas_call(
    kernel_c, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
)(jnp.ones((H, 8, W), jnp.float32)))


# d) 3D plane, dynamic unaligned sublane ds (the known-failing pattern)
def kernel_d(x_ref, o_ref):
    i = pl.program_id(0)
    o_ref[...] = x_ref[pl.ds(i * 8 + 3, 8), :]


try_case("d_dynamic_sublane_ds_3d", lambda: pl.pallas_call(
    kernel_d, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32), grid=(1,),
)(jnp.ones((H, W), jnp.float32)))


# e) value-level row slice after aligned full load (3D)
def kernel_e(x_ref, o_ref):
    v = x_ref[pl.ds(0, 16), :]
    o_ref[...] = jax.lax.slice(v, (3, 0), (11, W))


try_case("e_value_row_slice", lambda: pl.pallas_call(
    kernel_e, out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
)(jnp.ones((H, W), jnp.float32)))


# f) static unaligned LANE ds (forward kernel uses this — sanity)
def kernel_f(x_ref, o_ref):
    o_ref[...] = x_ref[:, pl.ds(5, 112)]


try_case("f_static_lane_ds", lambda: pl.pallas_call(
    kernel_f, out_shape=jax.ShapeDtypeStruct((8, 112), jnp.float32),
)(jnp.ones((8, W), jnp.float32)))
