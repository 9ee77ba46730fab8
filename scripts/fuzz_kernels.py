"""Cross-engine kernel fuzz harness (not part of CI: run manually).

Wave A: random shapes/quals across all engines, pallas-vs-jnp-vs-f64.
Wave B: deep shapes (R=256/H=384), homopolymer-switch haps, and PD-event
cases — the scenarios that caught the scan-coefficient underflow and the
scaled-kernel window-spread bugs.

Usage: python scripts/fuzz_kernels.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
from gkl_tpu.ops import pdhmm as pdhmm_ops
from gkl_tpu.ops.pairhmm import pairhmm_raw
from gkl_tpu.ops.pairhmm_pallas import pairhmm_raw_pallas, pairhmm_raw_pallas_scaled
from gkl_tpu.ops.pairhmm_pallas_cols import pairhmm_raw_pallas_cols
from gkl_tpu.ops.pdhmm_pallas import pdhmm_raw_pallas
from gkl_tpu.ops.sw import sw_forward
from gkl_tpu.ops.sw_pallas import sw_forward_pallas
fails = 0
trials = 0
for seed in (101, 2024, 31337, 777777):
    rng = np.random.default_rng(seed)
    for trial in range(5):
        trials += 1
        R = int(rng.choice([8, 16, 24, 32, 48, 64, 96]))
        H = int(rng.choice([8, 16, 24, 32, 48, 64, 96, 128]))
        P = 16
        bases = np.frombuffer(b'ACGTN', np.uint8)
        hap = bases[rng.integers(0, 5, (H, P))]
        read = bases[rng.integers(0, 5, (R, P))]
        k = min(R, H); read[:k, ::2] = hap[:k, ::2]
        q = rng.integers(0, 64, (R, P)).astype(np.uint8)
        iq = rng.integers(0, 64, (R, P)).astype(np.uint8)
        dq = rng.integers(0, 64, (R, P)).astype(np.uint8)
        gcp = rng.integers(0, 40, (R, P)).astype(np.uint8)
        haplen = rng.integers(1, H + 1, P).astype(np.int32)
        rslen = rng.integers(1, R + 1, P).astype(np.int32)
        args = (hap, read, q, iq, dq, gcp, haplen, rslen)
        ref = np.asarray(pairhmm_raw(*args, dtype='float32'))
        raw64 = np.asarray(pairhmm_raw(*args, dtype='float64')) * (2.0 ** -900)
        ok = ref > 1e-28
        for name, got in (('rows', np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True))),
                          ('cols', np.asarray(pairhmm_raw_pallas_cols(*args, lane_block=8, interpret=True)))):
            rel = (np.abs(got - ref) / np.maximum(ref, 1e-300))[ok]
            if rel.size and rel.max() > 5e-5:
                print(f's{seed}t{trial} {name} FAIL {rel.max():.2e} R={R} H={H}', flush=True); fails += 1
        if R % 4 == 0:
            m, e, fl = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
            recon = np.asarray(m).astype(np.float64) * np.exp2(np.asarray(e).astype(np.float64))
            ok64 = (raw64 > 1e-200) & (np.asarray(fl) == 0)
            rel = (np.abs(recon - raw64) / np.maximum(raw64, 1e-300))[ok64]
            if rel.size and (np.isnan(rel).any() or rel.max() > 2e-3):
                print(f's{seed}t{trial} scaled FAIL {rel.max():.2e} R={R} H={H}', flush=True); fails += 1
        hap_pd = np.zeros((H, P), np.uint8)
        for p in range(P):
            for _ in range(int(rng.integers(0, 5))):
                j = int(rng.integers(0, max(1, H - 6)))
                hap_pd[j, p] |= 2
                hap_pd[min(j + int(rng.integers(1, 6)), H - 1), p] |= 4
            for _ in range(int(rng.integers(0, 3))):
                s = int(rng.integers(0, H)); hap_pd[s, p] |= 1 | int(rng.choice([8, 16, 32, 64]))
        states = pdhmm_ops.column_states(hap_pd)
        pdargs = (hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen)
        pref = np.asarray(pdhmm_ops.pdhmm_raw(*pdargs, dtype='float32'))
        ppal = np.asarray(pdhmm_raw_pallas(*pdargs, lane_block=8, interpret=True))
        ok2 = pref > 1e-28
        rel = (np.abs(ppal - pref) / np.maximum(pref, 1e-300))[ok2]
        if rel.size and rel.max() > 5e-5:
            print(f's{seed}t{trial} pdhmm FAIL {rel.max():.2e} R={R} H={H}', flush=True); fails += 1
        N, M = int(rng.choice([8, 16, 24, 40, 64, 96])), int(rng.choice([8, 16, 32, 64]))
        sref = bases[rng.integers(0, 4, (N, P))].copy()
        salt = bases[rng.integers(0, 4, (M, P))].copy()
        rl = rng.integers(1, N + 1, P).astype(np.int32)
        al = rng.integers(1, M + 1, P).astype(np.int32)
        for ib in (False, True):
            a = sw_forward(sref, salt, rl, al, 200, -150, -260, -11, indel_boundary=ib, pack_bt=True)
            b = sw_forward_pallas(sref, salt, rl, al, 200, -150, -260, -11, indel_boundary=ib, lane_block=8, interpret=True)
            for x, y in zip(a, b):
                if not np.array_equal(np.asarray(x), np.asarray(y)):
                    print(f's{seed}t{trial} SW ib={ib} FAIL N={N} M={M}', flush=True); fails += 1
                    break
print(f'wave A: {fails} failures over {trials} trials', flush=True)

fails = 0
P = 8

def check(tag, args):
    global fails
    ref = np.asarray(pairhmm_raw(*args, dtype='float32'))
    raw64 = np.asarray(pairhmm_raw(*args, dtype='float64')) * (2.0 ** -900)
    ok = ref > 1e-28
    okr = (np.abs(ref - raw64) / np.maximum(raw64, 1e-300))[ok]
    if okr.size and okr.max() > 5e-5:
        print(f'{tag} jnp-f32-vs-f64 FAIL {okr.max():.2e}', flush=True); fails += 1
    for name, got in (('rows', np.asarray(pairhmm_raw_pallas(*args, lane_block=8, interpret=True))),
                      ('cols', np.asarray(pairhmm_raw_pallas_cols(*args, lane_block=8, interpret=True)))):
        rel = (np.abs(got - ref) / np.maximum(ref, 1e-300))[ok]
        if rel.size and rel.max() > 5e-5:
            print(f'{tag} {name} FAIL {rel.max():.2e}', flush=True); fails += 1
    if args[1].shape[0] % 4 == 0:
        m, e, fl = pairhmm_raw_pallas_scaled(*args, lane_block=8, interpret=True)
        recon = np.asarray(m).astype(np.float64) * np.exp2(np.asarray(e).astype(np.float64))
        ok64 = (raw64 > 1e-200) & (np.asarray(fl) == 0)
        rel = (np.abs(recon - raw64) / np.maximum(raw64, 1e-300))[ok64]
        if rel.size and (np.isnan(rel).any() or rel.max() > 2e-3):
            print(f'{tag} scaled FAIL {rel.max():.2e}', flush=True); fails += 1

bases = np.frombuffer(b'ACGTN', np.uint8)
rng = np.random.default_rng(424242)

# 1) homopolymer switch: hap = A-block then T-block; read all A.
#    Y long-span terms (A-region M carried across the T-region) dominate.
for H, R in ((128, 64), (256, 64)):
    hap = np.full((H, P), ord('A'), np.uint8); hap[H//2:] = ord('T')
    read = np.full((R, P), ord('A'), np.uint8)
    q = np.full((R, P), 30, np.uint8)
    iq = np.full((R, P), 35, np.uint8)
    dq = np.full((R, P), 35, np.uint8)
    gcp = np.full((R, P), 10, np.uint8)
    gcp[:, 4:] = 40  # half the lanes with high gap quals
    haplen = np.full(P, H, np.int32); haplen[1::2] = H - 3
    rslen = np.full(P, R, np.int32); rslen[2::2] = R - 5
    check(f'homopoly H={H}', (hap, read, q, iq, dq, gcp, haplen, rslen))

# 2) deep shapes with random data, R=256/H=384 (9-10 scan levels)
for t in range(3):
    R, H = 256, 384
    hap = bases[rng.integers(0, 5, (H, P))]
    read = bases[rng.integers(0, 5, (R, P))]
    k = min(R, H); read[:k, ::2] = hap[:k, ::2]
    q = rng.integers(0, 64, (R, P)).astype(np.uint8)
    iq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    dq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    gcp = rng.integers(0, 64, (R, P)).astype(np.uint8)
    haplen = rng.integers(1, H + 1, P).astype(np.int32)
    rslen = rng.integers(1, R + 1, P).astype(np.int32)
    check(f'deep t{t}', (hap, read, q, iq, dq, gcp, haplen, rslen))

# 3) pdhmm deep shapes with PD events and high gcp
for t in range(3):
    R, H = 256, 256
    hap = bases[rng.integers(0, 5, (H, P))]
    read = bases[rng.integers(0, 5, (R, P))]
    read[:32, ::2] = hap[:32, ::2]
    q = rng.integers(0, 64, (R, P)).astype(np.uint8)
    iq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    dq = rng.integers(0, 64, (R, P)).astype(np.uint8)
    gcp = rng.integers(0, 64, (R, P)).astype(np.uint8)
    haplen = rng.integers(H // 2, H + 1, P).astype(np.int32)
    rslen = rng.integers(R // 2, R + 1, P).astype(np.int32)
    hap_pd = np.zeros((H, P), np.uint8)
    for p in range(P):
        for _ in range(6):
            j = int(rng.integers(0, H - 8))
            hap_pd[j, p] |= 2
            hap_pd[j + int(rng.integers(1, 7)), p] |= 4
    from gkl_tpu.ops.pdhmm import SNP
    states = pdhmm_ops.column_states(hap_pd)
    pdargs = (hap, hap_pd, states, read, q, iq, dq, gcp, haplen, rslen)
    pref = np.asarray(pdhmm_ops.pdhmm_raw(*pdargs, dtype='float32'))
    pref64 = np.asarray(pdhmm_ops.pdhmm_raw(*pdargs, dtype='float64')) * (2.0 ** -900)
    ppal = np.asarray(pdhmm_raw_pallas(*pdargs, lane_block=8, interpret=True))
    ok = pref > 1e-28
    r1 = (np.abs(pref - pref64) / np.maximum(pref64, 1e-300))[ok]
    r2 = (np.abs(ppal - pref) / np.maximum(pref, 1e-300))[ok]
    if r1.size and r1.max() > 5e-5:
        print(f'pd-deep t{t} jnp-vs-f64 FAIL {r1.max():.2e}', flush=True); fails += 1
    if r2.size and r2.max() > 5e-5:
        print(f'pd-deep t{t} pallas FAIL {r2.max():.2e}', flush=True); fails += 1

print(f'total (waves A+B): {fails} failures', flush=True)
