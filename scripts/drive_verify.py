"""End-to-end drive on the real TPU backend: golden vectors through the
public API (PairHMM + PDHMM + SW + codec).  Used by /verify."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

import golden  # noqa: E402

from gkl_tpu import HaplotypeData, PairHMM, ReadData  # noqa: E402

cases = golden.load_pairhmm_cases()[:8]
hmm = PairHMM()
out = hmm.compute_likelihoods(
    [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases],
    [HaplotypeData(c.hap) for c in cases],
)
got = np.asarray(out).reshape(len(cases), len(cases)).diagonal()
exp = np.array([c.expected for c in cases])
err = np.max(np.abs(got - exp))
print("pairhmm golden max err:", err, flush=True)
assert err < 1e-5, (got, exp)

# constant-GOP flow (the BAM pipeline's path): identity-shared planes per
# length trigger _const_quals_of, and the device SYNTHESIZES iq/dq/gcp
# instead of uploading them — must match the per-read-planes path exactly
gop = {n: np.full(n, 45, np.uint8) for n in {len(c.read) for c in cases}}
gcp = {n: np.full(n, 10, np.uint8) for n in {len(c.read) for c in cases}}
creads_shared = [ReadData(c.read, c.q, gop[len(c.read)], gop[len(c.read)],
                          gcp[len(c.read)]) for c in cases]
creads_owned = [ReadData(c.read, c.q, gop[len(c.read)].copy(),
                         gop[len(c.read)].copy(), gcp[len(c.read)].copy())
                for c in cases]
hps = [HaplotypeData(c.hap) for c in cases]
out_shared = np.asarray(hmm.compute_likelihoods(creads_shared, hps))
out_owned = np.asarray(hmm.compute_likelihoods(creads_owned, hps))
assert np.array_equal(out_shared, out_owned), "const-plane synthesis drift"
print("const-GOP device synthesis == per-read planes", flush=True)

import jax as _jax  # noqa: E402

if _jax.default_backend() == "tpu":
    from gkl_tpu import parallel as _parallel  # noqa: E402

    mesh1 = _parallel.data_parallel_mesh(1)
    hmm_mesh = PairHMM(mesh=mesh1)
    out_mesh = np.asarray(hmm_mesh.compute_likelihoods(
        [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases], hps))
    out_plain = np.asarray(hmm.compute_likelihoods(
        [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in cases], hps))
    assert np.allclose(out_mesh, out_plain, atol=5e-5), "mesh path drift"
    print("mesh(1) sharded path == unsharded", flush=True)

from gkl_tpu.api_pdhmm import PDHMM  # noqa: E402

pd_cases = golden.load_pdhmm_cases("pdhmm_syn_199_68_51.txt")[:16]
pd = PDHMM()
t = len(pd_cases)
mh = max(len(c.hap) for c in pd_cases)
mr = max(len(c.read) for c in pd_cases)
hap2 = np.zeros((t, mh), np.uint8)
pd2 = np.zeros((t, mh), np.uint8)
r2 = np.zeros((t, mr), np.uint8)
q2 = np.zeros((t, mr), np.uint8)
iq2 = np.zeros((t, mr), np.uint8)
dq2 = np.zeros((t, mr), np.uint8)
g2 = np.zeros((t, mr), np.uint8)
hl = np.zeros(t, np.int64)
rl = np.zeros(t, np.int64)
for i, c in enumerate(pd_cases):
    hap2[i, : len(c.hap)] = c.hap
    pd2[i, : len(c.hap)] = c.hap_pd
    r2[i, : len(c.read)] = c.read
    q2[i, : len(c.read)] = c.q
    iq2[i, : len(c.read)] = c.iq
    dq2[i, : len(c.read)] = c.dq
    g2[i, : len(c.read)] = c.gcp
    hl[i], rl[i] = len(c.hap), len(c.read)
res = pd.compute_pdhmm(hap2, pd2, r2, q2, iq2, dq2, g2, hl, rl, batch_size=t)
pd_exp = np.array([c.expected for c in pd_cases])
pd_err = np.max(np.abs(res - pd_exp))
print("pdhmm golden max err:", pd_err, flush=True)
assert pd_err < 1e-4

# object path (cross product, identity-shared planes): the deduplicated
# device-expanded dispatch fires here — its diagonal must hit the same
# golden values the flat path just did
from gkl_tpu.api_pdhmm import PDHaplotypeData  # noqa: E402

pd_haps = [PDHaplotypeData(c.hap, c.hap_pd) for c in pd_cases]
pd_reads = [ReadData(c.read, c.q, c.iq, c.dq, c.gcp) for c in pd_cases]
res_x = np.asarray(pd.compute_likelihoods(pd_reads, pd_haps))
diag = res_x.reshape(t, t).diagonal()
pd_err_x = np.max(np.abs(diag - pd_exp))
print("pdhmm indexed object-path max err:", pd_err_x, flush=True)
assert pd_err_x < 1e-4

from gkl_tpu.api_sw import OverhangStrategy, SmithWaterman, SWParameters  # noqa: E402
from gkl_tpu.ops import sw_ref  # noqa: E402

rng = np.random.default_rng(7)
bases = np.frombuffer(b"ACGT", np.uint8)
refs = [bases[rng.integers(0, 4, 96)] for _ in range(4)]
alts = []
for r in refs:
    a = r[8:72].copy()
    mut = rng.random(len(a)) < 0.06
    a[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
    alts.append(a)
p = SWParameters(200, -150, -260, -11)
sw = SmithWaterman()
res_sw = sw.align_batch(refs, alts, p, OverhangStrategy.SOFTCLIP)
for r, a, out_sw in zip(refs, alts, res_sw):
    oracle = sw_ref.sw_align(r, a, 200, -150, -260, -11, int(OverhangStrategy.SOFTCLIP))
    assert (out_sw.cigar, out_sw.alignment_offset) == (oracle.cigar, oracle.offset), (
        out_sw, oracle.cigar, oracle.offset)
print("sw vs scalar oracle: 4/4 equal", flush=True)

from gkl_tpu import compression as comp  # noqa: E402

blocks = [bytes(bases[rng.integers(0, 4, 50000)]) for _ in range(4)]
for lvl in (1, 2, 6):
    rt = comp.inflate_blocks(comp.deflate_blocks(blocks, level=lvl))
    assert rt == blocks, lvl
print("codec round-trip l1/l2/l6 ok", flush=True)

print("VERIFY_OK", flush=True)
