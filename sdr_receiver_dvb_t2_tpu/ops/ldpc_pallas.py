"""Pallas TPU layered LDPC decoder exploiting the DVB-T2 quasi-cyclic
structure (EN 302 755 Annex A/B codes).

Key observation: with checks reindexed as c = t + q*u (t in [0,q), u in
[0,360)), a parity-table entry (group g, base b) connects bit (g, m) to check
(t = b mod q, u = (b div q + m) mod 360).  So each entry is a *static cyclic
rotation*: the 360 checks of row t see bit-group g rotated by s = b div q.
The whole Tanner graph becomes a list of (layer t, group g, shift s) triples
and the decoder needs NO gathers at all — only static-shift rolls of
(360, B) tiles, elementwise min/sign work on the VPU, and the q-layer
serial schedule of the reference's layered decoder
(`LDPC/layered_decoder.hh:83-110`) which converges in roughly half the
iterations of flooding.

This kernel keeps all state in VMEM (bit totals per group, parity totals,
and per-edge messages), so per iteration the only HBM traffic is zero.
Batch B codewords ride the 128-wide lane dimension.

Layout:
  total_info: (G+1, 360, B)  bit totals; group G is a +BIG dummy for padding
  total_par:  (q, 360, B)    parity totals, par[t, u] = bit k + t + q*u
  c2v:        (q, degmax+2, 360, B) check-to-variable messages, aligned to
              the check index u of layer t (info entries rolled by s)
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..dvbt2 import _etsi_tables as ET
from ..dvbt2.ldpc import _TABLE_KEY, get_code
from ..dvbt2.params import CodeRate, FECFrame

_BIG = 1e9


@dataclass(frozen=True, eq=False)
class QCTables:
    n: int
    k: int
    q: int
    n_groups: int
    degmax: int                    # max info entries per layer
    layer_deg: np.ndarray          # (q,)
    entry_g: np.ndarray            # (q, degmax) group index (G = dummy)
    entry_s: np.ndarray            # (q, degmax) shift


@functools.lru_cache(maxsize=None)
def qc_tables(frame: FECFrame, rate: CodeRate) -> QCTables:
    t = ET.LDPC_TABLES[_TABLE_KEY[(frame, rate)]]
    m_grp, n, k = t["M"], t["N"], t["K"]
    assert m_grp == 360
    r = n - k
    q = r // 360
    layers: list[list[tuple[int, int]]] = [[] for _ in range(q)]
    pos_iter = iter(t["POS"])
    grp = 0
    for deg, length in zip(t["DEG"], t["LEN"]):
        if deg == 0:
            break
        for _ in range(length):
            for _ in range(deg):
                b = next(pos_iter)
                layers[b % q].append((grp, b // q))
            grp += 1
    n_groups = grp
    degmax = max(len(x) for x in layers)
    layer_deg = np.array([len(x) for x in layers], dtype=np.int32)
    entry_g = np.full((q, degmax), n_groups, dtype=np.int32)
    entry_s = np.zeros((q, degmax), dtype=np.int32)
    for ti, ent in enumerate(layers):
        for j, (g, s) in enumerate(ent):
            entry_g[ti, j] = g
            entry_s[ti, j] = s
    return QCTables(n=n, k=k, q=q, n_groups=n_groups, degmax=degmax,
                    layer_deg=layer_deg, entry_g=entry_g, entry_s=entry_s)


def llrs_to_qc(tab: QCTables, llrs: np.ndarray):
    """(B, N) natural-order LLRs -> (total_info (G+1,360,B),
    total_par (q,360,B)) arrays."""
    b = llrs.shape[0]
    info = llrs[:, :tab.k].reshape(b, tab.n_groups, 360)
    total_info = np.empty((tab.n_groups + 1, 360, b), np.float32)
    total_info[:tab.n_groups] = np.moveaxis(info, 0, -1)
    total_info[tab.n_groups] = _BIG
    par = llrs[:, tab.k:].reshape(b, 360, tab.q)  # c = t + q*u -> [u, t]
    total_par = np.ascontiguousarray(
        np.moveaxis(par, 0, -1).transpose(1, 0, 2))  # (q, 360, B)
    return total_info.astype(np.float32), total_par.astype(np.float32)


def qc_to_bits(tab: QCTables, total_info: np.ndarray,
               total_par: np.ndarray) -> np.ndarray:
    """Final totals -> (B, N) hard bits."""
    b = total_info.shape[-1]
    info = np.moveaxis(total_info[:tab.n_groups], -1, 0).reshape(b, tab.k)
    par = np.moveaxis(total_par.transpose(1, 0, 2), -1, 0)  # (B, 360, q)
    out = np.concatenate([info, par.reshape(b, tab.n - tab.k)], axis=1)
    return (out < 0).astype(np.uint8)


def llrs_to_qc_jnp(tab: QCTables, llrs):
    """Device-side layout transform: (B, N) -> (total_info, total_par)."""
    b = llrs.shape[0]
    info = llrs[:, :tab.k].reshape(b, tab.n_groups, 360)
    total_info = jnp.concatenate(
        [jnp.moveaxis(info, 0, -1),
         jnp.full((1, 360, b), _BIG, llrs.dtype)], axis=0)
    par = llrs[:, tab.k:].reshape(b, 360, tab.q)
    total_par = jnp.moveaxis(par, 0, -1).transpose(1, 0, 2)
    return total_info, total_par


def qc_to_bits_jnp(tab: QCTables, total_info, total_par):
    """Device-side: final totals -> (B, N) hard bits (uint8)."""
    b = total_info.shape[-1]
    info = jnp.moveaxis(total_info[:tab.n_groups], -1, 0).reshape(b, tab.k)
    par = jnp.moveaxis(total_par.transpose(1, 0, 2), -1, 0).reshape(
        b, tab.n - tab.k)
    return (jnp.concatenate([info, par], axis=1) < 0).astype(jnp.uint8)


def llrs_nb_to_qc_jnp(tab: QCTables, llrs_t):
    """(N, B) transposed LLRs -> QC totals with NO batch transpose at all
    (the fused receive path emits this layout)."""
    b = llrs_t.shape[-1]
    info = llrs_t[:tab.k].reshape(tab.n_groups, 360, b)
    total_info = jnp.concatenate(
        [info, jnp.full((1, 360, b), _BIG, llrs_t.dtype)], axis=0)
    total_par = llrs_t[tab.k:].reshape(360, tab.q, b).transpose(1, 0, 2)
    return total_info, total_par


def qc_to_bits_nb_jnp(tab: QCTables, total_info, total_par):
    """Final totals -> (N, B) hard bits."""
    b = total_info.shape[-1]
    info = total_info[:tab.n_groups].reshape(tab.k, b)
    par = total_par.transpose(1, 0, 2).reshape(tab.n - tab.k, b)
    return (jnp.concatenate([info, par], axis=0) < 0).astype(jnp.uint8)


_VMEM_BUDGET = 96 * 1024 * 1024


def make_core(frame: FECFrame, rate: CodeRate, iters: int, batch: int,
              interpret: bool = False, dtype=None, variant: str = "auto"):
    """Select the layered-decoder core: fully-VMEM-resident when the code
    fits (zero HBM traffic per iteration), HBM-streamed otherwise."""
    if variant == "auto":
        fits = vmem_fit_bytes(frame, rate, batch) <= _VMEM_BUDGET
        variant = "vmem" if fits else "hbm"
    if variant == "vmem16":
        return make_pallas_layered_vmem(
            frame, rate, iters, batch, interpret=interpret,
            dtype=dtype or jnp.bfloat16, scan_dtype=jnp.bfloat16)
    if variant == "vmem":
        return make_pallas_layered_vmem(
            frame, rate, iters, batch, interpret=interpret,
            dtype=dtype or jnp.bfloat16)
    return make_pallas_layered(frame, rate, iters, batch,
                               interpret=interpret,
                               dtype=dtype or jnp.float32)


def make_decoder_nb(frame: FECFrame, rate: CodeRate, iters: int,
                    batch: int, interpret: bool = False,
                    dtype=None, variant: str = "auto"):
    """Pallas layered decoder over (N, B) transposed LLR layout."""
    tab = qc_tables(frame, rate)
    core = make_core(frame, rate, iters, batch, interpret=interpret,
                     dtype=dtype, variant=variant)

    def decode(llrs_t):
        ti, tp = llrs_nb_to_qc_jnp(tab, llrs_t.astype(jnp.float32))
        ti2, tp2 = core(ti, tp)
        return qc_to_bits_nb_jnp(tab, ti2, tp2)

    return jax.jit(decode)


def make_decoder_natural(frame: FECFrame, rate: CodeRate, iters: int,
                         batch: int, interpret: bool = False,
                         variant: str = "auto"):
    """Pallas layered decoder with natural (B, N) in/out layout."""
    tab = qc_tables(frame, rate)
    core = make_core(frame, rate, iters, batch, interpret=interpret,
                     variant=variant)

    def decode(llrs):
        ti, tp = llrs_to_qc_jnp(tab, llrs.astype(jnp.float32))
        ti2, tp2 = core(ti, tp)
        return qc_to_bits_jnp(tab, ti2, tp2)

    return jax.jit(decode)


def _roll(x, s):
    """roll(x, s)[u] = x[u - s] along axis 0 (static s)."""
    s = int(s) % x.shape[0]
    if s == 0:
        return x
    return jnp.concatenate([x[-s:], x[:-s]], axis=0)


def _layer_order(q: int, layer_order) -> list:
    """Static layer visitation order for one sweep.  Any permutation is a
    valid layered schedule (each layer body indexes its own tables);
    tools/twophase_study.py --schedules measured REVERSED converging
    ~0.4 sweeps faster than natural at the 19 dB operating point (the
    natural order was the worst of all tried), so perf-critical callers
    pass reversed while the equivalence tests keep natural."""
    if layer_order is None:
        return list(range(q))
    if layer_order == "reversed":
        return list(range(q))[::-1]
    order = [int(t) for t in layer_order]
    assert sorted(order) == list(range(q))
    return order


def make_pallas_layered(frame: FECFrame, rate: CodeRate, iters: int,
                        batch: int, offset: float = 0.5,
                        interpret: bool = False, dtype=jnp.float32):
    """Pallas TPU layered decoder.

    Returns fn(total_info (G+1,360,B), total_par (q,360,B)) -> updated totals
    (same layout as `llrs_to_qc`).  NOTE: c2v messages persist across
    iterations through the aliased HBM in/out buffers -- correct on
    hardware (donated buffers), but interpret mode does not honor the
    aliasing, so interpret-mode results only match the reference schedule
    for the first iteration.  State residency:
      - bit-group totals + parity totals: VMEM for the whole decode
      - c2v edge messages: HBM, streamed per layer with double-buffered DMA
    Per layer the compute is deg static-shift rolls + a two-minimum scan over
    (360, B) tiles -- no gathers, no scatters, VPU only.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tab = qc_tables(frame, rate)
    q, degmax, G = tab.q, tab.degmax, tab.n_groups
    E = degmax + 2
    B = batch
    off = np.float32(offset)
    deg_host = tab.layer_deg.astype(np.int32)
    g_host = tab.entry_g.reshape(-1).astype(np.int32)
    s_host = tab.entry_s.reshape(-1).astype(np.int32)
    n_steps = iters * q
    # dtype parameterizes only the HBM-streamed c2v messages (the DMA
    # traffic); totals and compute stay float32 -- Mosaic's dynamic sublane
    # rotate only supports 32-bit data and 360 rows break the bf16 bitcast
    # alignment, and f32 totals also keep the additive updates exact.
    DT = dtype

    def kernel(deg_ref, g_ref, s_ref, tinfo_in, tpar_in, c2v_in,
               tinfo_out, tpar_out, c2v_out,
               msgs, newc, in_buf, out_buf, in_sem, out_sem):
        tinfo_out[:] = tinfo_in[:]
        tpar_out[:] = tpar_in[:]
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (360, B), 0)
        big = jnp.asarray(_BIG, jnp.float32)

        def vroll(x, shift):
            return pltpu.roll(x, shift, axis=0)

        def in_dma(slot, layer):
            return pltpu.make_async_copy(
                c2v_in.at[layer], in_buf.at[slot], in_sem.at[slot])

        def out_dma(slot, layer):
            return pltpu.make_async_copy(
                out_buf.at[slot], c2v_out.at[layer], out_sem.at[slot])

        in_dma(0, 0).start()

        def step(idx, _):
            t = jax.lax.rem(idx, q)
            slot = jax.lax.rem(idx, 2)
            nxt = jax.lax.rem(idx + 1, 2)
            t_next = jax.lax.rem(idx + 1, q)

            @pl.when(idx + 1 < n_steps)
            def _():
                in_dma(nxt, t_next).start()
            in_dma(slot, t).wait()

            deg = deg_ref[t]
            # ---- build aligned v2c messages ----
            for j in range(degmax):
                @pl.when(j < deg)
                def _():
                    g = g_ref[t * degmax + j]
                    s = s_ref[t * degmax + j]
                    aligned = vroll(tinfo_out[g], s)
                    msgs[j] = aligned - in_buf[slot, j].astype(jnp.float32)

                @pl.when(j >= deg)
                def _():
                    msgs[j] = jnp.full((360, B), _BIG, jnp.float32)
            msgs[degmax] = (tpar_out[t]
                            - in_buf[slot, degmax].astype(jnp.float32))
            tm1 = jax.lax.rem(t + q - 1, q)
            shift_prev = jnp.where(t == 0, 1, 0)
            prev_al = vroll(tpar_out[tm1], shift_prev)
            mask0 = jnp.where(
                jnp.logical_and(t == 0, u_iota == 0), big,
                jnp.asarray(0.0, jnp.float32))
            msgs[E - 1] = (prev_al
                           - in_buf[slot, E - 1].astype(jnp.float32) + mask0)

            # ---- two-minimum + leave-one-out sign ----
            m0 = msgs[0]
            min1 = jnp.abs(m0)
            min2 = jnp.full((360, B), _BIG, jnp.float32)
            amin = jnp.zeros((360, B), jnp.int32)
            nneg = (m0 < 0).astype(jnp.int32)
            for j in range(1, E):
                mj = msgs[j]
                aj = jnp.abs(mj)
                is_new = aj < min1
                min2 = jnp.where(is_new, min1, jnp.minimum(min2, aj))
                min1 = jnp.where(is_new, aj, min1)
                amin = jnp.where(is_new, j, amin)
                nneg = nneg + (mj < 0).astype(jnp.int32)
            sign_all = 1.0 - 2.0 * jax.lax.rem(nneg, 2).astype(jnp.float32)

            @pl.when(idx >= 2)
            def _():
                out_dma(slot, jax.lax.rem(idx - 2, q)).wait()

            for j in range(E):
                mj = msgs[j]
                loo = jnp.where(amin == j, min2, min1)
                sgn = sign_all * jnp.where(mj < 0, -1.0, 1.0)
                newc[j] = sgn * jnp.maximum(loo - off, 0.0)

            # ---- additive write-backs ----
            for j in range(degmax):
                @pl.when(j < deg)
                def _():
                    g = g_ref[t * degmax + j]
                    s = s_ref[t * degmax + j]
                    stored = newc[j].astype(DT)
                    delta = (stored.astype(jnp.float32)
                             - in_buf[slot, j].astype(jnp.float32))
                    back = jax.lax.rem(360 - s, 360)
                    tinfo_out[g] = tinfo_out[g] + vroll(delta, back)
                    out_buf[slot, j] = stored

                @pl.when(j >= deg)
                def _():
                    out_buf[slot, j] = jnp.zeros((360, B), DT)
            stored_self = newc[degmax].astype(DT)
            tpar_out[t] = msgs[degmax] + stored_self.astype(jnp.float32)
            out_buf[slot, degmax] = stored_self
            stored_prev = newc[E - 1].astype(DT)
            prev_new = (msgs[E - 1] + stored_prev.astype(jnp.float32)
                        - mask0)
            # t==0: aligned slot u maps to par[q-1][u-1]; u=0 is the masked
            # non-edge and par[q-1][359] has no prev-edge consumer
            shift_back = jnp.where(t == 0, 359, 0)
            rolled = vroll(prev_new, shift_back)
            keep = jnp.logical_and(t == 0, u_iota == 359)
            tpar_out[tm1] = jnp.where(keep, tpar_out[tm1], rolled)
            out_buf[slot, E - 1] = stored_prev
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)
        out_dma(jax.lax.rem(n_steps - 2, 2),
                jax.lax.rem(n_steps - 2, q)).wait()
        out_dma(jax.lax.rem(n_steps - 1, 2),
                jax.lax.rem(n_steps - 1, q)).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tinfo_in
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tpar_in
            pl.BlockSpec(memory_space=pl.ANY),    # c2v_in (HBM)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((E, 360, B), jnp.float32),    # msgs
            pltpu.VMEM((E, 360, B), jnp.float32),    # newc
            pltpu.VMEM((2, E, 360, B), dtype),  # in_buf (c2v storage dtype)
            pltpu.VMEM((2, E, 360, B), dtype),  # out_buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G + 1, 360, B), jnp.float32),
            jax.ShapeDtypeStruct((q, 360, B), jnp.float32),
            jax.ShapeDtypeStruct((q, E, 360, B), dtype),
        ),
        input_output_aliases={3: 0, 4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def decode(total_info, total_par):
        c2v0 = jnp.zeros((q, E, 360, B), dtype)
        ti, tp, _ = call(jnp.asarray(deg_host), jnp.asarray(g_host),
                         jnp.asarray(s_host),
                         total_info.astype(jnp.float32),
                         total_par.astype(jnp.float32), c2v0)
        return ti, tp

    return jax.jit(decode)


def vmem_fit_bytes(frame: FECFrame, rate: CodeRate, batch: int,
                   c2v_bytes: int = 2) -> int:
    """VMEM bytes the fully-resident kernel needs for this code/batch."""
    tab = qc_tables(frame, rate)
    tile = 360 * batch
    e = tab.degmax + 2
    return (tile * 4 * (tab.n_groups + 1)      # totals (info)
            + tile * 4 * tab.q                 # totals (parity)
            + tile * c2v_bytes * tab.q * e     # resident c2v
            + tile * 4 * e                     # msgs scratch
            + tile * 4 * 4)                    # slack (iota/masks/regs)


def qc_syndrome_ok(frame: FECFrame, rate: CodeRate, total_info, total_par):
    """Per-codeword parity check from QC-layout totals (XLA, gather-free).

    Mirrors the layered kernel's alignment: check (t, u) sees info group g
    rolled by s, its own parity par[t, u], and the previous parity
    par[t-1, u] (par[q-1, u-1] for t=0; check 0 has none).  Equivalent of
    the reference decoder's `bad()` early-exit test
    (LDPC/layered_decoder.hh:65-82).  Returns (B,) bool.
    """
    return qc_syndrome_weight(frame, rate, total_info, total_par) == 0


def qc_syndrome_weight(frame: FECFrame, rate: CodeRate, total_info,
                       total_par):
    """Per-codeword count of FAILED parity checks ((B,) int32) — the
    `qc_syndrome_ok` computation with the count exposed (used as the
    difficulty signal in two-phase decode studies/scheduling)."""
    tab = qc_tables(frame, rate)
    hard_i = (total_info < 0).astype(jnp.int32)    # (G+1, 360, B)
    hard_p = (total_par < 0).astype(jnp.int32)     # (q, 360, B)
    b = total_info.shape[-1]
    bad = jnp.zeros((b,), jnp.int32)
    u0 = np.zeros((360, 1), np.int32)
    u0[0] = 1
    for t in range(tab.q):
        acc = hard_p[t]
        for j in range(int(tab.layer_deg[t])):
            g, s = int(tab.entry_g[t, j]), int(tab.entry_s[t, j])
            acc = acc + jnp.roll(hard_i[g], s, axis=0)
        if t > 0:
            acc = acc + hard_p[t - 1]
        else:
            # u=0 has no previous parity
            acc = acc + jnp.roll(hard_p[tab.q - 1], 1, axis=0) * (1 - u0)
        bad = bad + jnp.sum(jax.lax.rem(acc, 2), axis=0)
    return bad


def _make_layer_step(tab: QCTables, vti, vtp, c2v, msgs, u_iota, mask0,
                     off, DT, SD, count_bad: bool = False,
                     two_min: str = "scan"):
    """Shared statically-unrolled layer body for the VMEM-resident kernels.

    Closes over the kernel refs; `layer(t)` runs one check-layer update of
    the offset-min-sum layered schedule (reference semantics:
    LDPC/layered_decoder.hh:83-110) entirely on (360, B) VMEM tiles with
    static `pltpu.roll` shifts.

    With count_bad=True, `layer(t)` additionally returns this layer's
    failed-check count (a () int32), computed from the hard decisions of
    the POST-UPDATE totals in pass 2 — `m + new_c2v` is already in
    registers there, so the rolling syndrome costs two VPU ops per edge
    instead of the separate full `_make_syndrome_count` pass (whose
    per-edge rolls are the expensive part; a pass-1 variant forced the
    aligned rolls to materialize, and a read-modify-write scratch
    accumulator serialized the schedule — each spilled >100 MB of vregs
    at q=60).  The per-edge parities are SSA values tree-XOR-reduced at
    layer end (live set bounded by the layer degree).  A full sweep whose every layer reports
    0 is the adaptive decoder's exit condition; the totals evolve DURING
    the sweep, so this is a rolling check, not a snapshot — on a
    converged batch the two coincide, and the downstream BCH gate covers
    the margin."""
    from jax.experimental.pallas import tpu as pltpu

    q = tab.q
    layer_deg = [int(d) for d in tab.layer_deg]
    entry_g = tab.entry_g
    entry_s = tab.entry_s

    def layer(t):
        deg = layer_deg[t]
        et = deg + 2
        # ---- pass 1: v2c messages + two-minimum reduction ----
        min1 = min2 = nneg = None
        ajs = []
        negs = []
        for j in range(et):
            if j < deg:
                g, s = int(entry_g[t, j]), int(entry_s[t, j])
                aligned = pltpu.roll(vti[g], s, axis=0)
                m = aligned - c2v[t, j].astype(jnp.float32)
            elif j == deg:
                m = vtp[t] - c2v[t, j].astype(jnp.float32)
            else:
                if t > 0:
                    m = vtp[t - 1] - c2v[t, j].astype(jnp.float32)
                else:
                    prev = pltpu.roll(vtp[q - 1], 1, axis=0)
                    m = prev - c2v[t, j].astype(jnp.float32) + mask0
            ms = m.astype(SD)
            msgs[j] = ms
            aj = jnp.abs(ms)
            neg = (ms < 0).astype(jnp.int32)
            if two_min == "tree":
                ajs.append(aj)
                negs.append(neg)
            elif j == 0:
                min1 = aj
                min2 = jnp.full(vti.shape[1:], _BIG, SD)
                nneg = neg
            else:
                is_new = aj < min1
                min2 = jnp.where(is_new, min1, jnp.minimum(min2, aj))
                min1 = jnp.where(is_new, aj, min1)
                nneg = nneg + neg
        if two_min == "tree":
            # pairwise (min, 2nd-min) tree: same result as the scan but
            # a 4-level dependency chain instead of `et` sequential
            # is_new selects — gives the scheduler ILP if the scan is
            # latency-bound (measured via tools/ldpc_microbench.py)
            big = jnp.full(vti.shape[1:], _BIG, SD)
            pairs = [(a, big) for a in ajs]
            while len(pairs) > 1:
                nxt = []
                for i in range(0, len(pairs) - 1, 2):
                    (a1, b1), (a2, b2) = pairs[i], pairs[i + 1]
                    nxt.append((jnp.minimum(a1, a2),
                                jnp.minimum(jnp.maximum(a1, a2),
                                            jnp.minimum(b1, b2))))
                if len(pairs) % 2:
                    nxt.append(pairs[-1])
                pairs = nxt
            min1, min2 = pairs[0]
            while len(negs) > 1:
                negs = [negs[i] + negs[i + 1]
                        if i + 1 < len(negs) else negs[i]
                        for i in range(0, len(negs), 2)]
            nneg = negs[0]

        sign_all = (1 - 2 * jax.lax.rem(nneg, 2)).astype(SD)
        # offset applied once per layer to both candidate magnitudes
        mag1 = jnp.maximum(min1 - off, 0.0)
        mag2 = jnp.maximum(min2 - off, 0.0)

        # ---- pass 2: new c2v + additive total write-backs ----
        layer_nb = []
        for j in range(et):
            mj = msgs[j]
            # leave-one-out without argmin tracking: the minimal edge
            # (|mj| == min1) takes min2; ties make min2 == min1 so the
            # result is identical either way
            loo_mag = jnp.where(jnp.abs(mj) <= min1, mag2, mag1)
            sgn = jnp.where(mj < 0, -sign_all, sign_all)
            stored = (sgn * loo_mag).astype(DT)
            new = stored.astype(jnp.float32)
            if count_bad:
                # rolling syndrome from the POST-UPDATE totals: the
                # aligned total after this layer is m + new, both already
                # in registers here (pass-1 values stay single-consumer).
                # The t=0 masked non-edge carries +BIG in m -> positive
                # -> contributes nothing, exactly the u=0 exclusion.
                # Collected as SSA values, reduced by a tree at layer end:
                # a running read-modify-write accumulator serialized the
                # schedule and spilled ~120 MB of vregs.
                layer_nb.append(
                    (mj.astype(jnp.float32) + new < 0).astype(jnp.int32))
            if j < deg:
                g, s = int(entry_g[t, j]), int(entry_s[t, j])
                delta = new - c2v[t, j].astype(jnp.float32)
                vti[g] = vti[g] + pltpu.roll(delta, (360 - s) % 360,
                                             axis=0)
            elif j == deg:
                vtp[t] = mj.astype(jnp.float32) + new
            else:
                prev_new = mj.astype(jnp.float32) + new
                if t > 0:
                    vtp[t - 1] = prev_new
                else:
                    # aligned slot u maps to par[q-1][u-1]; u=0 is the
                    # masked non-edge, par[q-1][359] has no consumer
                    rolled = pltpu.roll(prev_new - mask0, 359, axis=0)
                    vtp[q - 1] = jnp.where(u_iota == 359, vtp[q - 1],
                                           rolled)
            c2v[t, j] = stored
        if count_bad:
            while len(layer_nb) > 1:
                layer_nb = [
                    (jnp.bitwise_xor(layer_nb[i], layer_nb[i + 1])
                     if i + 1 < len(layer_nb) else layer_nb[i])
                    for i in range(0, len(layer_nb), 2)]
            return jnp.sum(layer_nb[0])
        return None

    return layer


def _make_syndrome_count(tab: QCTables, vti, vtp, u_iota):
    """In-kernel parity check over the VMEM totals: returns a () int32 count
    of failed checks across the whole batch (0 = every codeword clean).

    Same alignment as `qc_syndrome_ok` (the XLA version used between
    chunked kernel calls), but runs inside the kernel on (360, B) tiles so
    the early-exit gate costs roughly half a layer pass, not an HBM
    round-trip.  Reference semantics: LDPC/layered_decoder.hh:65-82."""
    from jax.experimental.pallas import tpu as pltpu

    q = tab.q
    layer_deg = [int(d) for d in tab.layer_deg]
    entry_g = tab.entry_g
    entry_s = tab.entry_s

    def syndrome_count():
        bad = jnp.zeros(vti.shape[1:], jnp.int32)
        for t in range(q):
            acc = (vtp[t] < 0).astype(jnp.int32)
            for j in range(layer_deg[t]):
                g, s = int(entry_g[t, j]), int(entry_s[t, j])
                acc = acc + pltpu.roll((vti[g] < 0).astype(jnp.int32),
                                       s, axis=0)
            if t > 0:
                acc = acc + (vtp[t - 1] < 0).astype(jnp.int32)
            else:
                prev = pltpu.roll((vtp[q - 1] < 0).astype(jnp.int32),
                                  1, axis=0)
                # check (0, u=0) has no previous parity edge
                acc = acc + jnp.where(u_iota == 0, 0, prev)
            bad = bad + jnp.bitwise_and(acc, 1)
        return jnp.sum(bad)

    return syndrome_count


def make_pallas_layered_vmem_adaptive(frame: FECFrame, rate: CodeRate,
                                      max_iters: int = 24,
                                      check_every: int = 2,
                                      batch: int = 128,
                                      offset: float = 0.5,
                                      interpret: bool = False,
                                      dtype=jnp.bfloat16,
                                      min_iters: int = 0,
                                      rolling: bool = False,
                                      layer_order=None):
    """Single-call adaptive layered decoder: the early-exit loop lives INSIDE
    the kernel, so totals and c2v messages stay VMEM-resident for the whole
    decode (the chunked `make_adaptive_decoder_nb` pays a full c2v HBM
    round-trip per chunk — ~166 MB for normal-frame codes at B=128).

    Runs `check_every` layered iterations, computes the full-batch syndrome
    in-kernel, and stops as soon as every codeword is clean (or at
    max_iters).  Matches the reference's TRIALS=25 + per-iteration `bad()`
    semantics (ldpc_decoder.h:62, layered_decoder.hh:65-82).

    With rolling=True the syndrome is instead accumulated INSIDE every
    layer pass from the aligned totals pass 1 already rolls into place
    (see `_make_layer_step(count_bad=True)`), so the check runs every
    iteration for ~2 VPU ops/edge instead of a separate roll-heavy pass
    every `check_every` — the decoder exits at the EXACT convergence
    sweep.  The exit condition is "every layer clean at its visit within
    one sweep" (rolling, not a snapshot); `check_every` is ignored.

    Returns fn(total_info, total_par) -> (total_info', total_par',
    iters_used ()) — same totals layout as `make_pallas_layered_vmem`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tab = qc_tables(frame, rate)
    q, degmax, G = tab.q, tab.degmax, tab.n_groups
    E = degmax + 2
    B = batch
    DT = dtype
    off = float(offset)
    n_chunks = (max_iters + check_every - 1) // check_every
    order = _layer_order(q, layer_order)

    def kernel(min_it_ref, tinfo_hbm, tpar_hbm, tinfo_out, tpar_out,
               iters_out, vti, vtp, c2v, msgs, done, sem_i, sem_p):
        cp_i = pltpu.make_async_copy(tinfo_hbm, vti, sem_i)
        cp_p = pltpu.make_async_copy(tpar_hbm, vtp, sem_p)
        cp_i.start(); cp_p.start()
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (360, B), 0)
        big = jnp.asarray(_BIG, jnp.float32)
        mask0 = jnp.where(u_iota == 0, big, jnp.asarray(0.0, jnp.float32))
        for t in range(q):
            c2v[t] = jnp.zeros((E, 360, B), DT)
        done[0] = 0
        iters_out[0] = max_iters
        cp_i.wait(); cp_p.wait()

        layer = _make_layer_step(tab, vti, vtp, c2v, msgs, u_iota, mask0,
                                 off, DT, jnp.float32,
                                 count_bad=rolling)

        if rolling:
            def sweep_body(it, carry):
                @pl.when(done[0] == 0)
                def _():
                    bad = jnp.int32(0)
                    for t in order:
                        bad = bad + layer(t)

                    @pl.when(jnp.logical_and(
                        bad == 0, it + 1 >= jnp.maximum(min_it_ref[0],
                                                        min_iters)))
                    def _():
                        done[0] = 1
                        iters_out[0] = it + 1
                return carry

            jax.lax.fori_loop(0, max_iters, sweep_body, 0)
        else:
            syndrome_count = _make_syndrome_count(tab, vti, vtp, u_iota)

            def chunk_body(ci, carry):
                @pl.when(done[0] == 0)
                def _():
                    def it_body(_, c):
                        for t in order:
                            layer(t)
                        return c
                    jax.lax.fori_loop(0, check_every, it_body, 0)
                    it_now = (ci + 1) * check_every

                    # the syndrome pass is SKIPPED entirely below the
                    # traced floor (an SNR-steered schedule: at threshold
                    # SNR the first ~10 sweeps never converge, so their
                    # checks are pure overhead)
                    @pl.when(it_now >= jnp.maximum(min_it_ref[0],
                                                   min_iters))
                    def _():
                        n_bad = syndrome_count()

                        @pl.when(n_bad == 0)
                        def _():
                            done[0] = 1
                            iters_out[0] = it_now
                return carry

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        cp_oi = pltpu.make_async_copy(vti, tinfo_out, sem_i)
        cp_op = pltpu.make_async_copy(vtp, tpar_out, sem_p)
        cp_oi.start(); cp_op.start()
        cp_oi.wait(); cp_op.wait()

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=(
            jax.ShapeDtypeStruct((G + 1, 360, B), jnp.float32),
            jax.ShapeDtypeStruct((q, 360, B), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((G + 1, 360, B), jnp.float32),   # vti
            pltpu.VMEM((q, 360, B), jnp.float32),       # vtp
            pltpu.VMEM((q, E, 360, B), DT),             # resident c2v
            pltpu.VMEM((E, 360, B), jnp.float32),       # msgs
            pltpu.SMEM((1,), jnp.int32),                # done flag
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # the in-kernel syndrome pass adds int32 temporaries on top of the
        # resident c2v: the normal-frame codes need ~106 MB scoped VMEM,
        # within the chip's 128 MB but above the compiler's 100 MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024),
        interpret=interpret,
    )

    def decode(total_info, total_par, min_it=0):
        # min_it: TRACED floor for the first convergence check (SMEM
        # scalar) — the SNR-adaptive schedule: at threshold SNR the
        # early checks never pass, so skipping them removes pure
        # overhead without a recompile; the static `min_iters` build
        # parameter remains a lower bound.
        mi = jnp.asarray(min_it, jnp.int32).reshape(1)
        ti, tp, it = call(mi, total_info.astype(jnp.float32),
                          total_par.astype(jnp.float32))
        return ti, tp, it[0]

    return jax.jit(decode)


def make_pallas_layered_vmem_adaptive_io(frame, rate,
                                         max_iters: int = 24,
                                         check_every: int = 2,
                                         batch: int = 128,
                                         offset: float = 0.5,
                                         interpret: bool = False,
                                         dtype=jnp.bfloat16,
                                         min_iters: int = 0,
                                         layer_order=None,
                                         two_min: str = "scan"):
    """Adaptive kernel with FUSED IO: the bf16 LLR planes are DMA'd
    straight into the (idle) c2v scratch and unpacked to the f32 totals
    on the VPU (the `make_decoder_nb_fused_io` staging trick), and the
    hard-decision BITS stream back as an int32 sign plane — replacing the
    XLA-side f32 cast+concat+transpose on entry AND the 66 MB totals
    round-trip + compare on exit.  Per frame this removes most of the
    decode-launch fixed cost the bench pays 96 times per superstep.

    Returns fn(info (gi,E,360,B) DT, par (pi,E,360,B) DT, min_it (1,))
      -> (sign (Gp, 360, B) int32, iters ()) where sign rows 0..G-1 are
    the info groups' hard bits (1 = bit one) and rows G..G+q-1 the
    parity layers', in the same (360, B) check/group alignment the
    `llrs_nb_to_qc_jnp` layout uses.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tab = qc_tables(frame, rate)
    q, degmax, G = tab.q, tab.degmax, tab.n_groups
    E = degmax + 2
    B = batch
    DT = dtype
    off = float(offset)
    n_chunks = (max_iters + check_every - 1) // check_every
    order = _layer_order(q, layer_order)
    gi_rows = -(-G // E)
    pi_rows = -(-q // E)
    if gi_rows + pi_rows > q:
        raise ValueError("staging exceeds the c2v scratch for this code")

    def kernel(min_it_ref, llr_i_hbm, llr_p_hbm, sign_out, iters_out,
               vti, vtp, c2v, msgs, done, sem_i, sem_p):
        cp_i = pltpu.make_async_copy(llr_i_hbm, c2v.at[:gi_rows], sem_i)
        cp_p = pltpu.make_async_copy(
            llr_p_hbm, c2v.at[gi_rows:gi_rows + pi_rows], sem_p)
        cp_i.start(); cp_p.start()
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (360, B), 0)
        big = jnp.asarray(_BIG, jnp.float32)
        mask0 = jnp.where(u_iota == 0, big, jnp.asarray(0.0, jnp.float32))
        done[0] = 0
        iters_out[0] = max_iters
        cp_i.wait(); cp_p.wait()
        for g in range(G):
            vti[g] = c2v[g // E, g % E].astype(jnp.float32)
        vti[G] = jnp.full((360, B), _BIG, jnp.float32)
        for t in range(q):
            vtp[t] = c2v[gi_rows + t // E, t % E].astype(jnp.float32)
        for t in range(q):
            c2v[t] = jnp.zeros((E, 360, B), DT)

        layer = _make_layer_step(tab, vti, vtp, c2v, msgs, u_iota, mask0,
                                 off, DT, jnp.float32, two_min=two_min)
        syndrome_count = _make_syndrome_count(tab, vti, vtp, u_iota)

        def chunk_body(ci, carry):
            @pl.when(done[0] == 0)
            def _():
                def it_body(_, c):
                    for t in order:
                        layer(t)
                    return c
                jax.lax.fori_loop(0, check_every, it_body, 0)
                it_now = (ci + 1) * check_every

                @pl.when(it_now >= jnp.maximum(min_it_ref[0], min_iters))
                def _():
                    n_bad = syndrome_count()

                    @pl.when(n_bad == 0)
                    def _():
                        done[0] = 1
                        iters_out[0] = it_now
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        # hard-decision sign planes (1.0 = bit one) staged through the
        # (now idle) c2v scratch rows and DMA'd out as one block — an
        # int32 VMEM output of all planes would blow the VMEM budget
        for g in range(G):
            c2v[g // E, g % E] = (vti[g] < 0).astype(DT)
        for t in range(q):
            gp = G + t
            c2v[gp // E, gp % E] = (vtp[t] < 0).astype(DT)
        cp_o = pltpu.make_async_copy(c2v.at[:out_rows], sign_out, sem_i)
        cp_o.start(); cp_o.wait()

    out_rows = -(-(G + q) // E)

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, E, 360, B), DT),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((G + 1, 360, B), jnp.float32),   # vti
            pltpu.VMEM((q, 360, B), jnp.float32),       # vtp
            pltpu.VMEM((q, E, 360, B), DT),             # resident c2v
            pltpu.VMEM((E, 360, B), jnp.float32),       # msgs
            pltpu.SMEM((1,), jnp.int32),                # done flag
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024),
        interpret=interpret,
    )

    def decode(info, par, min_it=0):
        mi = jnp.asarray(min_it, jnp.int32).reshape(1)
        sign, it = call(mi, info, par)
        return sign.reshape(out_rows * E, 360, B)[:G + q], it[0]

    return jax.jit(decode)


def make_adaptive_decoder_nb_fused_io(frame, rate, max_iters: int = 24,
                                      check_every: int = 2,
                                      batch: int = 128,
                                      interpret: bool = False,
                                      dtype=jnp.bfloat16,
                                      min_iters: int = 0,
                                      layer_order=None,
                                      two_min: str = "scan"):
    """(N, B) bf16-LLR front door for the fused-IO adaptive kernel.

    fn(llrs_t (N, B), min_it) -> (bits (N, B) uint8, iters ()).  The
    entry reshapes stay in the LLR dtype (no f32 cast) and the exit
    unpacks the kernel's int32 sign planes — both a fraction of the
    f32-totals round trip."""
    tab = qc_tables(frame, rate)
    q, degmax, G = tab.q, tab.degmax, tab.n_groups
    E = degmax + 2
    B = batch
    k = tab.k
    gi_rows = -(-G // E)
    pi_rows = -(-q // E)
    core = make_pallas_layered_vmem_adaptive_io(
        frame, rate, max_iters=max_iters, check_every=check_every,
        batch=batch, interpret=interpret, dtype=dtype, min_iters=min_iters,
        layer_order=layer_order, two_min=two_min)

    def decode(llrs_t, min_it=0):
        v = llrs_t.astype(dtype)
        info = v[:k].reshape(G, 360, B)
        if gi_rows * E > G:
            info = jnp.concatenate(
                [info, jnp.zeros((gi_rows * E - G, 360, B), dtype)], axis=0)
        info = info.reshape(gi_rows, E, 360, B)
        par = v[k:].reshape(360, q, B).transpose(1, 0, 2)
        if pi_rows * E > q:
            par = jnp.concatenate(
                [par, jnp.zeros((pi_rows * E - q, 360, B), dtype)], axis=0)
        par = par.reshape(pi_rows, E, 360, B)
        sign, it = core(info, par, min_it)
        bits_i = sign[:G].reshape(k, B)
        bits_p = sign[G:G + q].transpose(1, 0, 2).reshape(tab.n - k, B)
        return (jnp.concatenate([bits_i, bits_p], axis=0) > 0.5
                ).astype(jnp.uint8), it

    return jax.jit(decode)


def make_adaptive_decoder_nb_fused(frame: FECFrame, rate: CodeRate,
                                   max_iters: int = 24, check_every: int = 2,
                                   batch: int = 128,
                                   interpret: bool = False,
                                   dtype=jnp.bfloat16, min_iters: int = 0,
                                   rolling: bool = False,
                                   layer_order=None):
    """(N, B) LLR front door for the in-kernel adaptive decoder.

    Returns fn(llrs_t (N,B)) -> (bits (N,B) uint8, iters_used ())."""
    tab = qc_tables(frame, rate)
    core = make_pallas_layered_vmem_adaptive(
        frame, rate, max_iters=max_iters, check_every=check_every,
        batch=batch, interpret=interpret, dtype=dtype, min_iters=min_iters,
        rolling=rolling, layer_order=layer_order)

    def decode(llrs_t, min_it=0):
        ti, tp = llrs_nb_to_qc_jnp(tab, llrs_t.astype(jnp.float32))
        ti2, tp2, it = core(ti, tp, min_it)
        return qc_to_bits_nb_jnp(tab, ti2, tp2), it

    return jax.jit(decode)


def make_pallas_layered_vmem(frame: FECFrame, rate: CodeRate, iters: int,
                             batch: int, offset: float = 0.5,
                             interpret: bool = False, dtype=jnp.bfloat16,
                             carry_c2v: bool = False,
                             scan_dtype=jnp.float32):
    """Fully VMEM-resident Pallas layered decoder (no per-layer HBM traffic).

    Unlike `make_pallas_layered` (which streams c2v messages through HBM
    with double-buffered DMA and drives the layer schedule with dynamic
    scalar-prefetched tables), this variant statically unrolls the q layers
    inside the iteration loop, so:
      - every cyclic shift is a *static* `pltpu.roll` (no dynamic sublane
        rotate),
      - there are no scalar-ref reads or `pl.when` degree branches,
      - the c2v edge messages live in a VMEM scratch for the whole decode
        (bf16 by default): zero HBM traffic per iteration.
    Totals are DMA'd HBM->VMEM once at entry and back once at exit.

    Only valid when `vmem_fit_bytes` is within the chip's VMEM (~100 MB);
    `make_decoder_nb` auto-selects this variant when it fits.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tab = qc_tables(frame, rate)
    q, degmax, G = tab.q, tab.degmax, tab.n_groups
    E = degmax + 2
    B = batch
    DT = dtype
    # the two-minimum scan + new-message math may run in bf16 (half the
    # vregs on the ALU-bound path); totals and additive updates stay f32
    # NOTE scan_dtype=bfloat16 works in interpret mode but current Mosaic
    # rejects the bf16 compare relayout on (360, B) tiles ("non-singleton
    # logical dimension is replicated"); keep float32 on hardware.
    SD = scan_dtype
    off = float(offset)  # python float: weak type, keeps SD arithmetic

    def kernel(*refs):
        if carry_c2v:
            (tinfo_hbm, tpar_hbm, c2v_hbm, tinfo_out, tpar_out, c2v_out,
             vti, vtp, c2v, msgs, sem_i, sem_p, sem_c) = refs
        else:
            (tinfo_hbm, tpar_hbm, tinfo_out, tpar_out,
             vti, vtp, c2v, msgs, sem_i, sem_p) = refs
        cp_i = pltpu.make_async_copy(tinfo_hbm, vti, sem_i)
        cp_p = pltpu.make_async_copy(tpar_hbm, vtp, sem_p)
        cp_i.start(); cp_p.start()
        if carry_c2v:
            cp_c = pltpu.make_async_copy(c2v_hbm, c2v, sem_c)
            cp_c.start()
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (360, B), 0)
        big = jnp.asarray(_BIG, jnp.float32)
        mask0 = jnp.where(u_iota == 0, big, jnp.asarray(0.0, jnp.float32))
        if not carry_c2v:
            for t in range(q):
                c2v[t] = jnp.zeros((E, 360, B), DT)
        else:
            cp_c.wait()
        cp_i.wait(); cp_p.wait()

        layer = _make_layer_step(tab, vti, vtp, c2v, msgs, u_iota, mask0,
                                 off, DT, SD)

        def body(_, carry):
            for t in range(q):
                layer(t)
            return carry

        jax.lax.fori_loop(0, iters, body, 0)
        cp_oi = pltpu.make_async_copy(vti, tinfo_out, sem_i)
        cp_op = pltpu.make_async_copy(vtp, tpar_out, sem_p)
        cp_oi.start(); cp_op.start()
        if carry_c2v:
            cp_oc = pltpu.make_async_copy(c2v, c2v_out, sem_c)
            cp_oc.start()
            cp_oc.wait()
        cp_oi.wait(); cp_op.wait()

    n_in = 3 if carry_c2v else 2
    out_shape = [
        jax.ShapeDtypeStruct((G + 1, 360, B), jnp.float32),
        jax.ShapeDtypeStruct((q, 360, B), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((G + 1, 360, B), jnp.float32),   # vti
        pltpu.VMEM((q, 360, B), jnp.float32),       # vtp
        pltpu.VMEM((q, E, 360, B), DT),             # resident c2v
        pltpu.VMEM((E, 360, B), scan_dtype),        # msgs
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if carry_c2v:
        out_shape.append(jax.ShapeDtypeStruct((q, E, 360, B), DT))
        scratch.append(pltpu.SemaphoreType.DMA)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    if carry_c2v:
        def decode(total_info, total_par, c2v_in):
            return call(total_info.astype(jnp.float32),
                        total_par.astype(jnp.float32), c2v_in)
    else:
        def decode(total_info, total_par):
            return call(total_info.astype(jnp.float32),
                        total_par.astype(jnp.float32))

    return jax.jit(decode)


def make_decoder_nb_fused_io(frame: FECFrame, rate: CodeRate, iters: int,
                             batch: int, interpret: bool = False,
                             dtype=jnp.bfloat16):
    """(N, B) LLR decoder with the QC layout transform folded into the
    kernel: the bf16 LLRs are DMA'd into the (idle) c2v scratch and cast
    to the f32 totals on the VPU, replacing the XLA-side f32
    cast+transpose+concat and halving the input DMA bytes.

    Returns fn(llrs_t (N,B)) -> (N,B) uint8 hard bits.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tab = qc_tables(frame, rate)
    q, degmax, G = tab.q, tab.degmax, tab.n_groups
    E = degmax + 2
    B = batch
    DT = dtype
    off = 0.5
    gi_rows = -(-G // E)
    pi_rows = -(-q // E)
    if gi_rows + pi_rows > q:
        raise ValueError("staging exceeds the c2v scratch for this code")

    def kernel(llr_i_hbm, llr_p_hbm, tinfo_out, tpar_out,
               vti, vtp, c2v, msgs, sem_i, sem_p):
        cp_i = pltpu.make_async_copy(llr_i_hbm, c2v.at[:gi_rows], sem_i)
        cp_p = pltpu.make_async_copy(
            llr_p_hbm, c2v.at[gi_rows:gi_rows + pi_rows], sem_p)
        cp_i.start(); cp_p.start()
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (360, B), 0)
        big = jnp.asarray(_BIG, jnp.float32)
        mask0 = jnp.where(u_iota == 0, big, jnp.asarray(0.0, jnp.float32))
        cp_i.wait(); cp_p.wait()
        for g in range(G):
            vti[g] = c2v[g // E, g % E].astype(jnp.float32)
        vti[G] = jnp.full((360, B), _BIG, jnp.float32)
        for t in range(q):
            vtp[t] = c2v[gi_rows + t // E, t % E].astype(jnp.float32)
        for t in range(q):
            c2v[t] = jnp.zeros((E, 360, B), DT)

        layer = _make_layer_step(tab, vti, vtp, c2v, msgs, u_iota, mask0,
                                 off, DT, jnp.float32)

        def body(_, carry):
            for t in range(q):
                layer(t)
            return carry

        jax.lax.fori_loop(0, iters, body, 0)
        cp_oi = pltpu.make_async_copy(vti, tinfo_out, sem_i)
        cp_op = pltpu.make_async_copy(vtp, tpar_out, sem_p)
        cp_oi.start(); cp_op.start()
        cp_oi.wait(); cp_op.wait()

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=(
            jax.ShapeDtypeStruct((G + 1, 360, B), jnp.float32),
            jax.ShapeDtypeStruct((q, 360, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((G + 1, 360, B), jnp.float32),   # vti
            pltpu.VMEM((q, 360, B), jnp.float32),       # vtp
            pltpu.VMEM((q, E, 360, B), DT),             # c2v (+staging)
            pltpu.VMEM((E, 360, B), jnp.float32),       # msgs
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    k = tab.k

    def decode(llrs_t):
        v = llrs_t.astype(DT)
        info = v[:k].reshape(G, 360, B)
        if gi_rows * E > G:
            info = jnp.concatenate(
                [info, jnp.zeros((gi_rows * E - G, 360, B), DT)], axis=0)
        info = info.reshape(gi_rows, E, 360, B)
        par = v[k:].reshape(360, q, B).transpose(1, 0, 2)  # (q, 360, B)
        if pi_rows * E > q:
            par = jnp.concatenate(
                [par, jnp.zeros((pi_rows * E - q, 360, B), DT)], axis=0)
        par = par.reshape(pi_rows, E, 360, B)
        ti, tp = call(info, par)
        return qc_to_bits_nb_jnp(tab, ti, tp)

    return jax.jit(decode)


def make_adaptive_decoder_nb(frame: FECFrame, rate: CodeRate,
                             max_iters: int = 24, chunk: int = 3,
                             batch: int = 128, interpret: bool = False,
                             dtype=jnp.bfloat16):
    """Early-exit layered decoder over (N, B) LLRs: runs `chunk` layered
    iterations per kernel call, checks the syndrome of the whole batch
    between calls, and stops as soon as every codeword is clean (or at
    max_iters).  The c2v messages are carried across calls through HBM so
    the schedule is identical to one long fixed-iteration decode.

    Matches the reference's semantics: TRIALS=25 with a per-iteration
    `bad()` early-exit (ldpc_decoder.h:62, layered_decoder.hh:65-82) --
    at clean-signal SNR this typically exits after 2-4 iterations.

    Returns fn(llrs_t (N,B)) -> (bits (N,B) uint8, iters_used ()).
    """
    tab = qc_tables(frame, rate)
    core = make_pallas_layered_vmem(frame, rate, chunk, batch,
                                    interpret=interpret, dtype=dtype,
                                    carry_c2v=True)
    e = tab.degmax + 2
    n_chunks = (max_iters + chunk - 1) // chunk

    def decode(llrs_t):
        ti, tp = llrs_nb_to_qc_jnp(tab, llrs_t.astype(jnp.float32))
        c2v0 = jnp.zeros((tab.q, e, 360, batch), dtype)

        def cond(state):
            ti, tp, c2v, it, done = state
            return jnp.logical_and(it < n_chunks, jnp.logical_not(done))

        def body(state):
            ti, tp, c2v, it, _ = state
            ti2, tp2, c2v2 = core(ti, tp, c2v)
            ok = jnp.all(qc_syndrome_ok(frame, rate, ti2, tp2))
            return (ti2, tp2, c2v2, it + 1, ok)

        ti, tp, c2v, it, _ = jax.lax.while_loop(
            cond, body, (ti, tp, c2v0, jnp.int32(0), jnp.bool_(False)))
        return qc_to_bits_nb_jnp(tab, ti, tp), it * chunk

    return jax.jit(decode)


def build_layered_stepper(frame: FECFrame, rate: CodeRate,
                          offset: float = 0.5, scale: float = 1.0,
                          c2v_dtype=None, layer_order=None):
    """One layered sweep over explicit state, jitted:
    fn(total_info, total_par, c2v) -> (total_info', total_par', c2v').

    The exact `build_layered_decoder` schedule with the c2v message state
    exposed, so convergence studies (tools/twophase_study.py) can observe
    per-sweep syndromes and snapshot posteriors without re-running from
    scratch.  `scale` multiplies the corrected magnitude (normalized
    min-sum; scale=1 offset=0.5 is the shipped kernel).  `c2v_dtype`
    (e.g. bf16) emulates the Pallas kernel's message storage precision:
    new messages round to that dtype at write-back and the rounded value
    feeds the total updates, exactly like `_make_layer_step`'s
    `stored = (...).astype(DT)`."""
    one_iteration = _build_one_iteration(qc_tables(frame, rate), offset,
                                         scale=scale, c2v_dtype=c2v_dtype,
                                         layer_order=layer_order)
    return jax.jit(lambda ti, tp, c2v: one_iteration((ti, tp, c2v)))


def build_layered_decoder(frame: FECFrame, rate: CodeRate, iters: int,
                          offset: float = 0.5, interpret: bool = False):
    """Returns jitted fn(total_info, total_par) -> (total_info', total_par').

    Fully unrolled static-roll implementation; compiles once per
    (code, iters).  The Pallas/Mosaic variant shares this structure; the
    XLA version is the portable baseline and is already gather-free.
    """
    tab = qc_tables(frame, rate)
    q, degmax = tab.q, tab.degmax
    one_iteration = _build_one_iteration(tab, offset)

    def decode(total_info, total_par):
        b = total_info.shape[-1]
        c2v = jnp.zeros((q, degmax + 2, 360, b), total_info.dtype)
        state = (total_info, total_par, c2v)
        state = jax.lax.fori_loop(
            0, iters, lambda _, s: one_iteration(s), state)
        return state[0], state[1]

    return jax.jit(decode)


def _build_one_iteration(tab: QCTables, offset: float, scale: float = 1.0,
                         c2v_dtype=None, layer_order=None):
    q, degmax = tab.q, tab.degmax
    layer_deg = tab.layer_deg
    entry_g = tab.entry_g
    entry_s = tab.entry_s
    off = np.float32(offset)
    sc = np.float32(scale)
    order = _layer_order(q, layer_order)

    def one_iteration(state):
        total_info, total_par, c2v = state
        for t in order:
            deg = int(layer_deg[t])
            # gather v2c messages for this layer, aligned to check index u
            msgs = []
            for j in range(deg):
                g, s = int(entry_g[t, j]), int(entry_s[t, j])
                msgs.append(_roll(total_info[g], s) - c2v[t, j])
            # parity self + prev
            msgs.append(total_par[t] - c2v[t, degmax])
            if t > 0:
                prev = total_par[t - 1]
            else:
                prev = _roll(total_par[q - 1], 1)
            if t == 0:
                # check 0 has no previous parity: mask with +BIG on u==0
                u0 = np.zeros((360, 1), np.float32)
                u0[0] = _BIG
                msgs.append(prev - c2v[t, degmax + 1] + u0)
            else:
                msgs.append(prev - c2v[t, degmax + 1])
            # two-minimum + leave-one-out sign across the row
            mags = [jnp.abs(m) for m in msgs]
            negs = [(m < 0) for m in msgs]
            min1 = mags[0]
            min2 = jnp.full_like(mags[0], _BIG)
            amin = jnp.zeros_like(mags[0], dtype=jnp.int32)
            nneg = negs[0].astype(jnp.int32)
            for j in range(1, len(msgs)):
                is_new = mags[j] < min1
                min2 = jnp.where(is_new, min1, jnp.minimum(min2, mags[j]))
                min1 = jnp.where(is_new, mags[j], min1)
                amin = jnp.where(is_new, j, amin)
                nneg = nneg + negs[j].astype(jnp.int32)
            sign_all = 1.0 - 2.0 * (nneg % 2).astype(jnp.float32)
            new_c2v = []
            for j, m in enumerate(msgs):
                loo = jnp.where(amin == j, min2, min1)
                sgn = sign_all * jnp.where(negs[j], -1.0, 1.0)
                nc = sgn * (jnp.maximum(loo - off, 0.0) * sc)
                if c2v_dtype is not None:
                    # kernel message-precision emulation: the stored
                    # (rounded) value feeds the total updates too
                    nc = nc.astype(c2v_dtype).astype(nc.dtype)
                new_c2v.append(nc)
            # write back ADDITIVELY (delta = new - old message) so a group
            # appearing twice in one layer composes instead of overwriting
            for j in range(deg):
                g, s = int(entry_g[t, j]), int(entry_s[t, j])
                delta = new_c2v[j] - c2v[t, j]
                total_info = total_info.at[g].add(_roll(delta, 360 - s))
                c2v = c2v.at[t, j].set(new_c2v[j])
            total_par = total_par.at[t].set(msgs[deg] + new_c2v[deg])
            prev_new = msgs[deg + 1] + new_c2v[deg + 1]
            if t == 0:
                # aligned slot u maps to par[q-1][u-1]; slot u=0 is the
                # masked non-edge (check 0 has no previous parity), and
                # par[q-1][359] (the last parity bit) has no prev-edge
                # consumer -- keep its old total instead of the garbage
                # that would land there after the -1 roll.
                rolled = _roll(prev_new, 360 - 1)
                keep_last = np.zeros((360, 1), np.float32)
                keep_last[359] = 1.0
                total_par = total_par.at[q - 1].set(
                    rolled * (1.0 - keep_last)
                    + total_par[q - 1] * keep_last)
            else:
                total_par = total_par.at[t - 1].set(prev_new)
            c2v = c2v.at[t, degmax].set(new_c2v[deg])
            c2v = c2v.at[t, degmax + 1].set(new_c2v[deg + 1])
        return total_info, total_par, c2v

    return one_iteration
