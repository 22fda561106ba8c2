"""One-shot device/tunnel characterization (run alone — owns the TPU).

Measures the numbers every perf decision in this repo hangs on:
  * host->device and device->host latency for tiny arrays (tunnel RTT);
  * transfer bandwidth at 1/8/32 MB in both directions;
  * whether dispatch is async (enqueue cost vs block_until_ready);
  * whether one (L,2)-u32 transfer beats two (L,)-u32 transfers (the
    GF (lo, hi) pair currently ships as TWO buffers each way);
  * u32 VPU multiply throughput + Goldilocks field-mul throughput -> the
    roofline denominator for MFU claims (BASELINE.md north star);
  * whether jax.experimental.serialize_executable round-trips on this
    backend (the planned warm-start fix).

Prints one JSON dict. Usage: python tools_probe_device.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

out = {}
dev = jax.devices()[0]
out["device"] = str(dev)


def t(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# d2h caveat: np.asarray on a device array CACHES the host copy, so timing
# repeated fetches of one array measures the cache, not the tunnel (the
# r5 first probe run recorded an impossible 7.7 TB/s). Every d2h sample below
# therefore fetches a DISTINCT, freshly computed device array exactly once.
_bump = jax.jit(lambda x, c: x + c)


def t_d2h(base, n=3):
    arrs = [_bump(base, np.uint32(i)) for i in range(n + 1)]
    jax.block_until_ready(arrs)
    np.asarray(arrs[0])  # warm any lazy layout/transfer machinery
    ts = []
    for a in arrs[1:]:
        t0 = time.perf_counter()
        np.asarray(a)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# --- tiny-transfer latency (RTT) ---
small = np.zeros(8, np.uint32)
out["h2d_tiny_ms"] = round(t(lambda: jax.device_put(small, dev).block_until_ready()) * 1e3, 2)
dsmall = jax.device_put(small, dev)
dsmall.block_until_ready()
out["d2h_tiny_ms"] = round(t_d2h(dsmall, n=5) * 1e3, 2)

# --- bandwidth ---
for mb in (1, 8, 32):
    big = np.random.randint(0, 2**31, size=(mb * 1024 * 1024 // 4,), dtype=np.int32)
    dt = t(lambda: jax.device_put(big, dev).block_until_ready(), n=3)
    out[f"h2d_{mb}mb_ms"] = round(dt * 1e3, 1)
    out[f"h2d_{mb}mb_MBps"] = round(mb / dt, 1)
    dbig = jax.device_put(big.view(np.uint32), dev)
    dbig.block_until_ready()
    dt = t_d2h(dbig, n=3)
    out[f"d2h_{mb}mb_ms"] = round(dt * 1e3, 1)
    out[f"d2h_{mb}mb_MBps"] = round(mb / dt, 1)

# --- one (L,2) transfer vs two (L,) transfers, 8 MB total ---
L = 1024 * 1024
lo = np.random.randint(0, 2**31, size=(L,), dtype=np.int32)
hi = np.random.randint(0, 2**31, size=(L,), dtype=np.int32)
pair = np.stack([lo, hi], axis=1)
out["h2d_two_bufs_ms"] = round(
    t(lambda: jax.block_until_ready((jax.device_put(lo, dev), jax.device_put(hi, dev)))) * 1e3, 1
)
out["h2d_one_buf_ms"] = round(
    t(lambda: jax.device_put(pair, dev).block_until_ready()) * 1e3, 1
)
dlo, dhi = jax.device_put(lo.view(np.uint32), dev), jax.device_put(hi.view(np.uint32), dev)
dpair = jax.device_put(pair.view(np.uint32), dev)
jax.block_until_ready((dlo, dhi, dpair))


def t_d2h_two(a, b, n=3):
    pairs = [(_bump(a, np.uint32(i)), _bump(b, np.uint32(i))) for i in range(n + 1)]
    jax.block_until_ready(pairs)
    np.asarray(pairs[0][0]), np.asarray(pairs[0][1])
    ts = []
    for x, y in pairs[1:]:
        t0 = time.perf_counter()
        np.asarray(x), np.asarray(y)
        ts.append(time.perf_counter() - t0)
    return min(ts)


out["d2h_two_bufs_ms"] = round(t_d2h_two(dlo, dhi) * 1e3, 1)
out["d2h_one_buf_ms"] = round(t_d2h(dpair) * 1e3, 1)

# --- dispatch async? (enqueue a jitted op, measure enqueue vs completion) ---
@jax.jit
def heavy(x):
    for _ in range(64):
        x = x * x + x
    return x

xb = jax.device_put(np.ones((4096, 4096), np.float32), dev)
heavy(xb).block_until_ready()
t0 = time.perf_counter()
y = heavy(xb)
enq = time.perf_counter() - t0
y.block_until_ready()
tot = time.perf_counter() - t0
out["dispatch_enqueue_ms"] = round(enq * 1e3, 2)
out["dispatch_total_ms"] = round(tot * 1e3, 2)

# --- u32 multiply + field-mul throughput (roofline denominators) ---
from qp_zk_circuits_tpu.field import goldilocks as gl

N = 1 << 24  # 16M lanes

@jax.jit
def raw_mul(a, b):
    x, y = a, b
    for _ in range(16):
        x = x * y + x
    return x

a = jax.device_put(np.random.randint(0, 2**31, (N,), dtype=np.int32).view(np.uint32), dev)
b = jax.device_put(np.random.randint(0, 2**31, (N,), dtype=np.int32).view(np.uint32), dev)
raw_mul(a, b).block_until_ready()
dt = t(lambda: raw_mul(a, b).block_until_ready(), n=3)
out["u32_mul_add_Gops"] = round(16 * 2 * N / dt / 1e9, 1)  # 16 iters x (mul+add)

@jax.jit
def gf_mul_chain(alo, ahi, blo, bhi):
    x = gl.GF(alo, ahi)
    y = gl.GF(blo, bhi)
    for _ in range(8):
        x = gl.mul(x, y)
    return x.lo, x.hi

M = 1 << 22  # 4M field lanes
args = [
    jax.device_put(np.random.randint(0, 2**31, (M,), dtype=np.int32).view(np.uint32), dev)
    for _ in range(4)
]
jax.block_until_ready(gf_mul_chain(*args))
dt = t(lambda: jax.block_until_ready(gf_mul_chain(*args)), n=3)
out["gf_mul_Gops"] = round(8 * M / dt / 1e9, 2)

# --- f32 matmul MFU sanity (what fraction of peak does XLA get here) ---
@jax.jit
def mm(x, y):
    return x @ y

K = 4096
xf = jax.device_put(np.random.rand(K, K).astype(np.float32), dev)
yf = jax.device_put(np.random.rand(K, K).astype(np.float32), dev)
mm(xf, yf).block_until_ready()
dt = t(lambda: mm(xf, yf).block_until_ready(), n=3)
out["f32_matmul_Tflops"] = round(2 * K**3 / dt / 1e12, 1)

# --- serialize_executable round-trip ---
try:
    from jax.experimental import serialize_executable as se

    lowered = jax.jit(lambda x: x * 2 + 1).lower(jax.ShapeDtypeStruct((128,), jnp.uint32))
    compiled = lowered.compile()
    blob, in_tree, out_tree = se.serialize(compiled)
    out["serialized_bytes"] = len(blob)
    reloaded = se.deserialize_and_load(blob, in_tree, out_tree)
    r = reloaded(jax.device_put(np.arange(128, dtype=np.uint32), dev))
    ok = bool(np.all(np.asarray(r) == np.arange(128, dtype=np.uint32) * 2 + 1))
    out["serialize_executable_ok"] = ok
except Exception as e:  # noqa: BLE001
    out["serialize_executable_ok"] = False
    out["serialize_executable_err"] = repr(e)[:200]

print(json.dumps(out, indent=1))
