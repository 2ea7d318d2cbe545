"""Fully-fused Pallas blind rotation: the whole CMUX loop in one kernel.

One ``pallas_call`` with grid=(n_steps, batch_tiles) runs all n blind-rotation
steps (src/bootstrapping.rs:90-105) with the accumulator RESIDENT IN VMEM for
the entire rotation; only the bootstrapping key streams from HBM (pipelined
block DMA, ~0.1MB/step).  Per step, entirely on-chip:

  1. (first batch tile only) the step's GGSW rows are expanded into
     sign-twisted Toeplitz operands — one strided ``pltpu.roll`` of the
     negacyclically extended row [g, -g] per row (sign applied in u32 BEFORE
     the signed-limb split, which cannot negate -128), peeled into 4 balanced
     int8 limb planes stored in a VMEM scratch shared by every batch tile.
     This is the B-independent VPU cost of the step; building it once per
     step (not once per tile) is what makes large batches profitable;
  2. per-sample negacyclic rotation acc * X^{a_i} — a CYCLIC barrel of
     log2(N) static lane-rolls selected by exponent bits plus one
     closed-form negacyclic sign fix (VPU), one [bt, N] plane at a time
     (``_rotate_negacyclic``);
  3. diff = rot - acc; exact carry-chain signed decomposition into
     R=(k+1)*levels int8 digit planes, skipping the provably-zero digits
     below the rounding boundary (``_decompose_kept_int8``);
  4. column-outer contraction against the scratch Toeplitz planes on the MXU
     (int8 x int8 -> int32), limb recombination (wrapping shifts) and
     acc += delta (VPU).

Layout notes (Mosaic): everything is addressed through UNTILED leading dims —
acc [T, k+1, bt, N], Toeplitz scratch [R*(k+1)*4, N, N], exponents
[n*T, bt, 1] — so only the last two dims of any indexed array are
hardware-tiled.  Slicing a size-3 tiled sublane dim is rejected by Mosaic
("slice shape must be aligned to tiling"), 1-D -> 3-D shape casts are
unsupported, and ``dynamic_rotate`` exists only for 32-bit data (the
circulant is rolled in u32, then limb-peeled).

Exactly reproduces the reference CMUX semantics: acc += EP(digits(rot-acc))
== cmux(BK_i, acc, rot) (src/ggsw.rs:164-178).  Bit-exact vs the XLA
formulations (tested on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_tpu.params import TfheParams

NUM_LIMBS = 4

# Per-generation tuning for the wide whole-scan kernel: (wide batch-tile cap,
# narrow batch-tile cap, scoped-VMEM budget handed to Mosaic).  Only MEASURED
# generations get an entry (ARTIFACTS/probe_r3*.log: on v5e, bt=768 gives
# 3847/3937 rot/s chain/balanced vs 3702/3774 at 512; B=4096 needs 120.2MB
# scoped VMEM, OK at a 125MB budget).  Unmeasured generations are CALIBRATED
# at first use: a probe kernel asks Mosaic to scope the aggressive budget and
# falls back to the conservative round-2 constants if that fails to compile
# (ADVICE r3: don't inherit untested rows).
_GEN_TUNING = {
    "v5 lite": (768, 256, 125 * 1024 * 1024),  # v5e (device_kind "TPU v5 lite")
}
_AGGRESSIVE_TUNING = (768, 256, 125 * 1024 * 1024)
_DEFAULT_TUNING = (512, 256, 116 * 1024 * 1024)


def _probe_vmem_budget(budget_bytes: int) -> bool:
    """True iff a kernel scoping ~``budget_bytes`` of VMEM compiles AND runs
    on the current TPU.  Cheap (one trivial grid step over a big scratch)."""

    def kern(x_ref, o_ref, big_ref):
        big_ref[0:1, :] = x_ref[:, :128]
        o_ref[...] = x_ref[...]
        o_ref[:, :128] = big_ref[0:1, :]

    rows = (budget_bytes - 2 * 512 * 4) // (4 * 128) - 8
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 512), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=budget_bytes
            ),
        )(jnp.zeros((1, 512), jnp.uint32))
        jax.block_until_ready(out)
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _tuning() -> tuple[int, int, int]:
    try:
        kind = jax.devices()[0].device_kind.lower()
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return _DEFAULT_TUNING
    for key, val in _GEN_TUNING.items():
        if key in kind:
            return val
    if on_tpu and _probe_vmem_budget(_AGGRESSIVE_TUNING[2]):
        return _AGGRESSIVE_TUNING
    return _DEFAULT_TUNING


def _rotate_negacyclic(accp, a, coeff, n: int):
    """acc * X^a for per-sample exponents a in [0, 2N): a CYCLIC barrel over
    the low log2(N) exponent bits (2 VPU ops per stage) followed by one
    closed-form sign fix — out[i] = (-1)^{floor(((i-a) mod 2N)/N)} *
    in[(i-a) mod N].  Saves ~45% of the barrel's VPU ops vs negating inside
    every stage (the old 4-op stages; cf. src/utils.rs:183-207 semantics).
    """
    rot = accp
    for kb in range(n.bit_length() - 1):  # log2(N) cyclic stages
        s = 1 << kb
        r = pltpu.roll(rot, s, 1)
        rot = jnp.where(((a >> kb) & 1) == 1, r, rot)
    wrapped = ((coeff - a) & jnp.int32(2 * n - 1)) >= n
    return jnp.where(wrapped, -rot, rot)


def _decompose_kept_int8(diff, dp, out_dtype=jnp.int8):
    """Exact signed decomposition (src/decomposer.rs:42-80) -> MSB-first list
    of `levels` int8 digit planes.

    round_value zeroes the low `ignored_bits`; since log_base | log_q, every
    digit below l_full-levels is then identically zero and carries nothing,
    so the carry chain starts at the first kept digit with carry=0.

    The shift/mask stage stays in u32 vregs deliberately: narrow-int
    experiments both fail Mosaic lowering — vector<i8> arithmetic is
    rejected outright ("Only vector<i16> and vector<i32> are supported")
    and 16-bit shifts fail to legalize (arith.shrsi / arith.shrui on i16).
    The carry chain itself runs in int32 (the masked digit is a small
    non-negative value, so the u32->i32 convert is in-range): digits land
    in [-B/2, B] (the +B carry anomaly, src/decomposer.rs:42-80), which
    fits int8 directly for base <= 64, so each digit needs ONE truncating
    i32->i8 cast instead of the old 5-op masked sign-extension.
    """
    ig = dp.ignored_bits
    if ig:
        msb = (diff >> jnp.uint32(ig - 1)) & jnp.uint32(1)
        v = (diff >> jnp.uint32(ig)) + msb  # (32-ig)-bit rounded significand
    else:
        v = diff
    base_mask = jnp.uint32((1 << dp.log_base) - 1)
    half = jnp.int32(1 << (dp.log_base - 1))
    carry = jnp.int32(0)
    kept = []
    for l in range(dp.levels):
        x = ((v >> jnp.uint32(dp.log_base * l)) & base_mask).astype(jnp.int32)
        res = x + carry  # in [0, B]
        cm = res & half
        res = res - (cm << 1)  # in [-B/2, B]
        carry = cm >> jnp.int32(dp.log_base - 1)
        kept.append(res.astype(out_dtype))
    kept.reverse()
    return kept


def _decompose_balanced_int8(diff, dp):
    """Closed-form balanced decomposition (the ``impl='fusedb'`` digit
    convention): EXACT mod 2^32, no carry chain.

    With H = sum_l (B/2) B^l over the kept levels, the plain base-B digits
    e_l of u = round(diff)/2^ig + H satisfy sum (e_l - B/2) B^l * 2^ig ==
    round_value(diff) (mod 2^32) — the SAME reconstruction (and the same
    half-up rounding: the +2^(ig-1) inside the pre-shift constant is the
    rounding bit) as the reference carry chain, so the external product is
    exact with digits in [-B/2, B/2) instead of the reference's
    [-B/2, B] with the +B anomaly.  The digit VECTOR differs from
    src/decomposer.rs:42-80 wherever the anomaly fires (P ~ 1/(2B) per
    digit), so this variant is NOT bit-identical to the reference trace —
    it is a different exact gadget decomposition with strictly smaller
    digit bound (see DIVERGENCES.md).  Perf: 6 independent 5-op nibble
    extracts replace the 9-op/level sequential chain — less VPU work and
    no loop-carried dependence for the scheduler.
    """
    b = dp.log_base
    ig = dp.ignored_bits
    half = 1 << (b - 1)
    hh = sum(half << (b * l) for l in range(dp.levels))  # H
    if ig:
        c = jnp.uint32(((hh << ig) + (1 << (ig - 1))) & 0xFFFFFFFF)
        u = (diff + c) >> jnp.uint32(ig)
    else:
        u = diff + jnp.uint32(hh)
    mask = jnp.uint32((1 << b) - 1)
    kept = [
        (((u >> jnp.uint32(b * l)) & mask).astype(jnp.int32) - half).astype(
            jnp.int8
        )
        for l in range(dp.levels)
    ]
    kept.reverse()
    return kept


def _kernel_wide(a_ref, acc_in_ref, bk_full_ref, acc_ref, w_ref, *,
                 params: TfheParams, bt: int, n_tiles: int, key_limbs: int,
                 balanced: bool = False):
    """Wide-dot variant of ``_kernel``: same math, MXU-friendlier shapes.

    The Toeplitz scratch is laid out as ONE int8 matrix
    [R_d*N, (k+1)*key_limbs*N] (R_d = (k+1)*levels digit rows) instead of
    R_d*(k+1)*key_limbs separate [N, N] planes, and each poly's `levels`
    digit planes are lane-concatenated into [bt, levels*N].  The per-tile
    contraction is then k+1 dots of [bt, levels*N] x [levels*N, 12N] instead
    of 216 dots of [bt, N] x [N, N]: 72x fewer accumulator read-modify-writes
    and long weight streams through the MXU.  MEASURED (v5e, default_128,
    B=3072, bt=512): statistically tied with the narrow kernel
    (1162 vs 1157 us/step) — the MXU floor is not accumulator-RMW-bound —
    but it compiles ~5-20x faster (50s vs 240-1090s), which is why it is
    the default ``wide=True`` path.

    Also trims the decomposition carry chain and uses the cyclic-barrel
    rotation (see the module helpers).  NB: input/output aliasing does NOT
    work here — on hardware Mosaic allocates separate VMEM windows for the
    aliased operand and output, so the output window starts UNINITIALIZED
    (measured: bit-mismatch on v5e while interpret mode, which does seed the
    aliased output, passes) — hence the same explicit step-0 copy as
    ``_kernel``.
    """
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    r_d = k1 * levels  # digit rows
    cl = k1 * key_limbs  # output column blocks
    drop = NUM_LIMBS - key_limbs

    step = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[tile] = acc_in_ref[tile]

    # ---- expand this step's GGSW rows once per step (first tile); row block
    # rd = poly*levels + level holds GGSW row rd*k1 + col's limb planes at
    # column block col*key_limbs + limb (see _kernel for the sign/limb notes)
    @pl.when(tile == 0)
    def _():
        bk_step = bk_full_ref[0]  # [R_d*(k+1), N] u32
        for rd in range(r_d):
            for col in range(k1):
                g = bk_step[rd * k1 + col : rd * k1 + col + 1, :]
                g_ext = jnp.concatenate([g, -g], axis=1)  # sign in u32
                base = jnp.broadcast_to(g_ext, (n, 2 * n))
                circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
                w = circ[:, :n] + jnp.uint32(0x80808080)
                for i, l in enumerate(range(drop, NUM_LIMBS)):
                    limb = ((w >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                        jnp.int32
                    ) - 128
                    c0 = (col * key_limbs + i) * n
                    w_ref[rd * n : (rd + 1) * n, c0 : c0 + n] = limb.astype(
                        jnp.int8
                    )

    acc = acc_ref[tile]  # [k+1, bt, N] u32
    a = a_ref[0, 0]  # [bt, 1] int32
    coeff = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)

    comb = jnp.zeros((bt, cl * n), jnp.int32)
    for poly in range(k1):
        accp = acc[poly]  # [bt, N]
        rot = _rotate_negacyclic(accp, a, coeff, n)
        dec = _decompose_balanced_int8 if balanced else _decompose_kept_int8
        d8s = dec(rot - accp, dp)
        dp_cat = jnp.concatenate(d8s, axis=1)  # [bt, levels*N]
        comb += jnp.dot(
            dp_cat,
            w_ref[poly * levels * n : (poly + 1) * levels * n, :],
            preferred_element_type=jnp.int32,
        )
    new_planes = []
    for col in range(k1):
        delta = jnp.zeros((bt, n), jnp.uint32)
        for i, l in enumerate(range(drop, NUM_LIMBS)):
            c0 = (col * key_limbs + i) * n
            delta = delta + (
                comb[:, c0 : c0 + n].astype(jnp.uint32) << jnp.uint32(8 * l)
            )
        new_planes.append(acc[col] + delta)
    # whole-block store: per-plane stores acc_ref[tile, col] blow Mosaic
    # compile time past 25 min (vs ~50s with the stack store); measured
    acc_ref[tile] = jnp.stack(new_planes)


def _kernel_wide_pipe(a_next_ref, a0_ref, acc_in_ref, bk_full_ref, acc_ref,
                      w_ref, d_ref, *, params: TfheParams, bt: int,
                      n_tiles: int, key_limbs: int, balanced: bool):
    """Wide-dot + software-pipelined variant: per-COLUMN wide dots so that
    column c's accumulator plane is final immediately after its dot, letting
    that poly's step-s+1 digit pipeline (VPU barrel + decompose) overlap the
    remaining columns' MXU work — the narrow ``_kernel_pipe`` idea applied to
    the wide layout that actually wins on hardware.

    Staged digits live as ONE lane-concatenated block [bt, R_d*N] per (parity,
    tile) (poly-major lane slices, 3072-aligned stores); the contraction for
    column c is a single [bt, R_d*N] x [R_d*N, key_limbs*N] dot against the
    column's lane slice of the wide Toeplitz scratch.  The accumulator is
    still written once per step as a stacked block (per-plane ref stores blow
    Mosaic compile time — see ``_kernel_wide``); the staging reads the plane
    VALUES, not the ref.  r3 probes: the serial digit chain is the only
    digit cost the wide kernel leaves exposed (~8% of the step at bt=512);
    this kernel hides it.  Exact CMUX semantics (src/ggsw.rs:164-178);
    ``balanced`` selects the closed-form digit convention (DIVERGENCES.md #3).

    MEASURED (v5e, default_128, B=3072 as 2x1536 chunks, bt=512): 3,489
    boots/s, 0 errors (ARTIFACTS/bench_fusedwb_r4.json) — LOSES to the plain
    wide kernel's 4,021: the column-ordered dots and the staged digit block's
    extra VMEM round trip cost more than the ~8% serial-digit exposure they
    hide, and the B<=1536 scratch bound forfeits the bt=768 tile.  Kept as a
    tested variant; ``fused``/``fusedb`` remain the throughput default.
    """
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    r_d = k1 * levels
    drop = NUM_LIMBS - key_limbs
    lw = levels * n  # lanes per poly's digit block

    step = pl.program_id(0)
    tile = pl.program_id(1)
    coeff = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)
    dec = _decompose_balanced_int8 if balanced else _decompose_kept_int8

    # ---- Toeplitz expansion for step s (identical to _kernel_wide)
    @pl.when(tile == 0)
    def _():
        bk_step = bk_full_ref[0]  # [R_d*(k+1), N] u32
        for rd in range(r_d):
            for col in range(k1):
                g = bk_step[rd * k1 + col : rd * k1 + col + 1, :]
                g_ext = jnp.concatenate([g, -g], axis=1)
                base = jnp.broadcast_to(g_ext, (n, 2 * n))
                circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
                w = circ[:, :n] + jnp.uint32(0x80808080)
                for i, l in enumerate(range(drop, NUM_LIMBS)):
                    limb = ((w >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                        jnp.int32
                    ) - 128
                    c0 = (col * key_limbs + i) * n
                    w_ref[rd * n : (rd + 1) * n, c0 : c0 + n] = limb.astype(
                        jnp.int8
                    )

    # ---- prologue: stage step-0 digits from the initial accumulator
    @pl.when(step == 0)
    def _():
        acc_ref[tile] = acc_in_ref[tile]
        a0 = a0_ref[0]  # [bt, 1]
        for poly in range(k1):
            accp = acc_in_ref[tile, poly]
            rot = _rotate_negacyclic(accp, a0, coeff, n)
            d8s = dec(rot - accp, dp)
            d_ref[0, tile, :, poly * lw : (poly + 1) * lw] = jnp.concatenate(
                d8s, axis=1
            )

    a_next = a_next_ref[0, 0]  # [bt, 1] int32: step s+1's exponents

    def body(ri: int, wi: int):
        dp_all = d_ref[ri, tile]  # [bt, R_d*N] staged digits of step s
        new_planes = []
        for col in range(k1):
            comb = jnp.dot(
                dp_all,
                w_ref[:, col * key_limbs * n : (col + 1) * key_limbs * n],
                preferred_element_type=jnp.int32,
            )  # [bt, key_limbs*N]
            delta = jnp.zeros((bt, n), jnp.uint32)
            for i, l in enumerate(range(drop, NUM_LIMBS)):
                delta = delta + (
                    comb[:, i * n : (i + 1) * n].astype(jnp.uint32)
                    << jnp.uint32(8 * l)
                )
            plane = acc_ref[tile, col] + delta
            new_planes.append(plane)
            # VPU: this poly's step-s+1 digits — independent of the remaining
            # columns' dots, so the scheduler overlaps them
            rot = _rotate_negacyclic(plane, a_next, coeff, n)
            d8s = dec(rot - plane, dp)
            d_ref[wi, tile, :, col * lw : (col + 1) * lw] = jnp.concatenate(
                d8s, axis=1
            )
        acc_ref[tile] = jnp.stack(new_planes)

    @pl.when(step % 2 == 0)
    def _():
        body(0, 1)

    @pl.when(step % 2 == 1)
    def _():
        body(1, 0)


def _kernel_pipe(a_next_ref, a0_ref, acc_in_ref, bk_full_ref, acc_ref,
                 w_ref, d_ref, *, params: TfheParams, bt: int, n_tiles: int,
                 key_limbs: int):
    """Software-pipelined variant of ``_kernel``: the VPU digit pipeline of
    step s+1 runs UNDER the MXU contraction of step s.

    The per-step serial chain is digits(s) -> matmuls(s) -> acc update(s) ->
    digits(s+1) -> ...  In ``_kernel`` the whole digit pipeline (barrel
    rotation + carry chain, the measured ~90us/step VPU cost) sits on the
    critical path.  Here digits are STAGED in a parity double-buffered VMEM
    scratch: cell (s, t) contracts the staged digits of step s column by
    column, and immediately after updating accumulator plane c computes that
    poly's step-s+1 digits (rotation by a[s+1]) into the other parity buffer
    — work that is independent of the remaining columns' matmuls, so
    Mosaic's in-cell scheduler can run it on the VPU while the MXU streams
    the next column.  Only the LAST column's digit pipeline (plus the step-0
    prologue) stays exposed.

    The parity buffers are addressed with static leading indices under
    ``pl.when(step % 2 == ...)`` so reads (parity of s) and writes (parity
    of s+1) are provably disjoint to the compiler.  ``a_next_ref`` streams
    exponent block s+1 (the caller pads ``a_hat`` with one zero block so the
    final step's staging — whose output is never read — stays in bounds);
    ``a0_ref`` carries step 0's exponents for the prologue.
    """
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    n_rows = k1 * levels * k1
    drop = NUM_LIMBS - key_limbs

    step = pl.program_id(0)
    tile = pl.program_id(1)
    coeff = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)

    # ---- Toeplitz expansion for step s (identical to _kernel)
    @pl.when(tile == 0)
    def _():
        bk_step = bk_full_ref[0]
        for row in range(n_rows):
            g = bk_step[row : row + 1, :]
            g_ext = jnp.concatenate([g, -g], axis=1)
            base = jnp.broadcast_to(g_ext, (n, 2 * n))
            circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
            w = circ[:, :n] + jnp.uint32(0x80808080)
            for i, l in enumerate(range(drop, NUM_LIMBS)):
                limb = ((w >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                    jnp.int32
                ) - 128
                w_ref[row * key_limbs + i] = limb.astype(jnp.int8)

    # ---- prologue: stage step-0 digits from the initial accumulator
    @pl.when(step == 0)
    def _():
        acc_ref[tile] = acc_in_ref[tile]
        a0 = a0_ref[0]  # [bt, 1]
        for poly in range(k1):
            accp = acc_in_ref[tile, poly]
            rot = _rotate_negacyclic(accp, a0, coeff, n)
            for j, d8 in enumerate(_decompose_kept_int8(rot - accp, dp)):
                d_ref[0, tile, poly * levels + j] = d8

    a_next = a_next_ref[0, 0]  # [bt, 1] int32: step s+1's exponents

    def body(ri: int, wi: int):
        for col in range(k1):
            # MXU: column `col` of step s against the staged digits
            acc4 = [jnp.zeros((bt, n), jnp.int32) for _ in range(key_limbs)]
            for rd in range(k1 * levels):
                d8 = d_ref[ri, tile, rd]
                row = rd * k1 + col
                for l in range(key_limbs):
                    acc4[l] += jnp.dot(
                        d8, w_ref[row * key_limbs + l],
                        preferred_element_type=jnp.int32,
                    )
            delta = jnp.zeros((bt, n), jnp.uint32)
            for i, l in enumerate(range(drop, NUM_LIMBS)):
                delta = delta + (acc4[i].astype(jnp.uint32) << jnp.uint32(8 * l))
            plane = acc_ref[tile, col] + delta
            acc_ref[tile, col] = plane
            # VPU: poly `col`'s step-s+1 digits — independent of the
            # remaining columns' matmuls, overlaps them
            rot = _rotate_negacyclic(plane, a_next, coeff, n)
            for j, d8 in enumerate(_decompose_kept_int8(rot - plane, dp)):
                d_ref[wi, tile, col * levels + j] = d8

    @pl.when(step % 2 == 0)
    def _():
        body(0, 1)

    @pl.when(step % 2 == 1)
    def _():
        body(1, 0)


def _kernel(a_ref, acc_in_ref, bk_full_ref, acc_ref, w_ref, *,
            params: TfheParams, bt: int, n_tiles: int, key_limbs: int,
            skip_expand: bool = False, skip_digits: bool = False):
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    n_rows = k1 * levels * k1  # GGSW rows x columns, flattened
    drop = NUM_LIMBS - key_limbs  # low key limbs truncated (0 = exact)

    step = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[tile] = acc_in_ref[tile]

    # ---- 1. expand this step's GGSW rows into int8 Toeplitz limb planes,
    # once per step (first tile), shared by all batch tiles via scratch.
    # (skip_expand/skip_digits are TIMING PROBES ONLY: they produce wrong
    # results but isolate the expansion / digit-pipeline cost on hardware.)
    @pl.when((step == 0) & (tile == 0) if skip_expand else (tile == 0))
    def _():
        bk_step = bk_full_ref[0]  # [R*(k+1), N] u32, row-flattened
        # NB: no extra rounding offset when truncating low limbs — the
        # balanced split (limbs in [-128,128)) already rounds the dropped
        # byte to nearest.  Adding +0x80 here biases every kept coefficient
        # by +128, which amplifies coherently through the mask rows at
        # decryption (x N/2 via <a,s>) and flips ~3/4 of gate outputs.
        for row in range(n_rows):
            g = bk_step[row : row + 1, :]  # [1, N] (static sublane slice)
            g_ext = jnp.concatenate([g, -g], axis=1)  # sign in u32
            base = jnp.broadcast_to(g_ext, (n, 2 * n))
            # one strided roll builds the whole [N, 2N] circulant; Mosaic
            # only implements dynamic_rotate on 32-bit data, so the roll
            # stays in u32 and the balanced int8 limbs are peeled after
            circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
            w = circ[:, :n] + jnp.uint32(0x80808080)
            for i, l in enumerate(range(drop, NUM_LIMBS)):
                limb = ((w >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                    jnp.int32
                ) - 128
                w_ref[row * key_limbs + i] = limb.astype(jnp.int8)

    acc = acc_ref[tile]  # [k+1, bt, N] u32 (plane-major)
    a = a_ref[0, 0]  # [bt, 1] int32 (2-D tile, block-streamed per (step, tile))
    coeff = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)

    # ---- 2-4. interleaved per-poly rotation/decomposition (VPU) and MXU
    # contraction: poly p's matmuls depend only on poly p's digits, so
    # issuing them immediately lets the scheduler hide poly p+1's barrel
    # shifter / carry chain under poly p's MXU time (an all-VPU phase
    # followed by an all-MXU phase has no such overlap).
    acc4 = [
        [jnp.zeros((bt, n), jnp.int32) for _ in range(key_limbs)]
        for _ in range(k1)
    ]
    for poly in range(k1):
        accp = acc[poly]  # [bt, N]
        if skip_digits:  # timing probe: bypass barrel + carry chain
            kept8 = [accp.astype(jnp.int8)] * levels
        else:
            rot = _rotate_negacyclic(accp, a, coeff, n)
            kept8 = _decompose_kept_int8(rot - accp, dp)
        for j, d8 in enumerate(kept8):
            for col in range(k1):
                row = (poly * levels + j) * k1 + col  # canonical GGSW order
                for l in range(key_limbs):
                    acc4[col][l] += jnp.dot(
                        d8,
                        w_ref[row * key_limbs + l],
                        preferred_element_type=jnp.int32,
                    )
    new_planes = []
    for col in range(k1):
        delta = jnp.zeros((bt, n), jnp.uint32)
        for i, l in enumerate(range(drop, NUM_LIMBS)):
            delta = delta + (acc4[col][i].astype(jnp.uint32) << jnp.uint32(8 * l))
        new_planes.append(acc[col] + delta)
    acc_ref[tile] = jnp.stack(new_planes)


def _kernel_cols(a_ref, acc_in_ref, bk_ref, acc_ref, w_ref, d_ref, *,
                 params: TfheParams, bt: int, key_limbs: int):
    """Column-split variant: grid (steps, k+1 columns, batch tiles).

    Per (step, col) the Toeplitz scratch holds only column ``col``'s
    R*key_limbs planes (1/(k+1) the VMEM of ``_kernel``), which frees enough
    VMEM to double the batch tile to 512 — the hypothesis being that M=512
    rows per dot balance the MXU's 512-cycle weight load (the bt=256 kernel
    runs ~65% MXU).  Digits are computed ONCE per (step, tile) at col==0 into
    a shared int8 scratch; each column updates only its own accumulator plane
    (exact: the wrapping-u32 limb recombination is linear, and column c's
    update never feeds column c'!=c's digits within the step).

    MEASURED (v5e, default_128, B=4096): 2917 boots/s, 0/4096 errors — LOSES
    to ``_kernel`` (3171 boots/s @4096): the digit planes re-read from VMEM
    scratch per column, the 3x grid-cell count, and the per-column expansion
    sitting on the critical path with only 1/(k+1) of the MXU work to hide it
    cost more than the bigger M saves.  Kept as a tested variant
    (impl='fusedc'/'fusedc3'); the row-major ``_kernel`` stays the default.
    """
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    r_rows = k1 * levels
    drop = NUM_LIMBS - key_limbs

    step = pl.program_id(0)
    col = pl.program_id(1)
    tile = pl.program_id(2)

    @pl.when((step == 0) & (col == 0))
    def _():
        acc_ref[tile] = acc_in_ref[tile]

    # ---- expand THIS column's GGSW rows into int8 Toeplitz limb planes,
    # once per (step, col) (first tile), shared by all batch tiles
    @pl.when(tile == 0)
    def _():
        bk_step = bk_ref[0, 0]  # [R, N] u32: column ``col``'s rows
        for row in range(r_rows):
            g = bk_step[row : row + 1, :]
            g_ext = jnp.concatenate([g, -g], axis=1)  # sign in u32
            base = jnp.broadcast_to(g_ext, (n, 2 * n))
            circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
            w = circ[:, :n] + jnp.uint32(0x80808080)
            for i, l in enumerate(range(drop, NUM_LIMBS)):
                limb = ((w >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                    jnp.int32
                ) - 128
                w_ref[row * key_limbs + i] = limb.astype(jnp.int8)

    a = a_ref[0, 0]  # [bt, 1] int32
    coeff = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)

    # ---- digits once per (step, tile): col==0 rotates/decomposes from the
    # step-start accumulator (no column has updated it yet) into the shared
    # scratch; col 1..k read the scratch.
    @pl.when(col == 0)
    def _():
        for poly in range(k1):
            accp = acc_ref[tile, poly]  # [bt, N] u32
            rot = _rotate_negacyclic(accp, a, coeff, n)
            for j, d8 in enumerate(_decompose_kept_int8(rot - accp, dp)):
                d_ref[tile, poly * levels + j] = d8

    # ---- this column's contraction: R digit rows x key_limbs planes
    acc4 = [jnp.zeros((bt, n), jnp.int32) for _ in range(key_limbs)]
    for row in range(r_rows):
        d8 = d_ref[tile, row]
        for l in range(key_limbs):
            acc4[l] += jnp.dot(
                d8, w_ref[row * key_limbs + l], preferred_element_type=jnp.int32
            )
    delta = jnp.zeros((bt, n), jnp.uint32)
    for i, l in enumerate(range(drop, NUM_LIMBS)):
        delta = delta + (acc4[i].astype(jnp.uint32) << jnp.uint32(8 * l))
    acc_ref[tile, col] += delta


@functools.partial(
    jax.jit, static_argnames=("params", "interpret", "batch_tile", "key_limbs")
)
def blind_rotate_fused_cols(params: TfheParams, acc0, bk_u32, a_hat,
                            interpret=False, batch_tile: int | None = None,
                            key_limbs: int = NUM_LIMBS):
    """Column-split whole-scan rotation (see ``_kernel_cols``): bt=512 default.

    acc0 u32[B, k+1, N], bk u32[n, R, k+1, N], a_hat int32[n, B] -> final acc.
    Bit-exact vs ``blind_rotate_fused`` and the scan backends (key_limbs=4).
    """
    batch, k1, n = acc0.shape
    steps, r_dim = bk_u32.shape[0], bk_u32.shape[1]
    assert 1 <= key_limbs <= NUM_LIMBS
    bt = batch_tile or min(batch, 512)
    assert batch % bt == 0, (batch, bt)
    n_tiles = batch // bt

    acc0_tiles = jnp.swapaxes(acc0.reshape(n_tiles, bt, k1, n), 1, 2)
    a_tiles = a_hat.reshape(steps, n_tiles, bt, 1)
    # column-major key blocks: [steps, k+1(col), R, N]
    bk_cols = jnp.moveaxis(bk_u32, 2, 1)
    out = pl.pallas_call(
        functools.partial(_kernel_cols, params=params, bt=bt,
                          key_limbs=key_limbs),
        grid=(steps, k1, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, bt, 1), lambda s, c, t: (s, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, k1, bt, n), lambda s, c, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r_dim, n), lambda s, c, t: (s, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_tiles, k1, bt, n), lambda s, c, t: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k1, bt, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r_dim * key_limbs, n, n), jnp.int8),
            pltpu.VMEM((n_tiles, r_dim, bt, n), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * batch * r_dim * k1 * n * n * key_limbs,
            bytes_accessed=steps * r_dim * k1 * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_tiles, acc0_tiles, bk_cols)
    return jnp.swapaxes(out, 1, 2).reshape(batch, k1, n)


@functools.partial(
    jax.jit,
    static_argnames=("params", "interpret", "batch_tile", "key_limbs",
                     "balanced"),
)
def blind_rotate_fused_wide_pipe(params: TfheParams, acc0, bk_u32, a_hat,
                                 interpret=False, batch_tile: int | None = None,
                                 key_limbs: int = NUM_LIMBS,
                                 balanced: bool = False):
    """Wide-dot software-pipelined whole-scan rotation (``_kernel_wide_pipe``).

    The parity digit scratch costs 2*B*R_d*N int8 (B*18.4KB at default_128)
    on top of the 57MB wide Toeplitz scratch, bounding B at ~1536 per call;
    bigger batches are chunked by the caller.  Bit-exact vs the matching
    digit convention's other backends."""
    batch, k1, n = acc0.shape
    steps, r_dim = bk_u32.shape[0], bk_u32.shape[1]
    assert 1 <= key_limbs <= NUM_LIMBS
    if batch_tile is None:
        bt = next(t for t in range(min(batch, 512), 0, -1) if batch % t == 0)
    else:
        bt = batch_tile
    assert batch % bt == 0, (batch, bt)
    n_tiles = batch // bt
    r_d = k1 * params.pbs_decomposer.levels

    acc0_tiles = jnp.swapaxes(acc0.reshape(n_tiles, bt, k1, n), 1, 2)
    a_pad = jnp.concatenate(
        [a_hat, jnp.zeros((1,) + a_hat.shape[1:], a_hat.dtype)], axis=0
    )
    a_tiles = a_pad.reshape(steps + 1, n_tiles, bt, 1)
    a0 = a_hat[0].reshape(n_tiles, bt, 1)
    bk_flat = bk_u32.reshape(steps, r_dim * k1, n)
    out = pl.pallas_call(
        functools.partial(_kernel_wide_pipe, params=params, bt=bt,
                          n_tiles=n_tiles, key_limbs=key_limbs,
                          balanced=balanced),
        grid=(steps, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, bt, 1), lambda s, t: (s + 1, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, k1, bt, n), lambda s, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_dim * k1, n), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_tiles, k1, bt, n), lambda s, t: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k1, bt, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r_d * n, k1 * key_limbs * n), jnp.int8),
            pltpu.VMEM((2, n_tiles, bt, r_d * n), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_tuning()[2],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * batch * r_d * k1 * n * n * key_limbs,
            bytes_accessed=steps * r_d * k1 * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_tiles, a0, acc0_tiles, bk_flat)
    return jnp.swapaxes(out, 1, 2).reshape(batch, k1, n)


@functools.partial(
    jax.jit,
    static_argnames=("params", "interpret", "batch_tile", "key_limbs"),
)
def blind_rotate_fused_pipe(params: TfheParams, acc0, bk_u32, a_hat,
                            interpret=False, batch_tile: int | None = None,
                            key_limbs: int = NUM_LIMBS):
    """Software-pipelined whole-scan rotation (see ``_kernel_pipe``): step
    s+1's digit pipeline overlaps step s's MXU contraction via a parity
    double-buffered digit scratch.  The scratch costs 2*B*R_d*N int8 bytes
    (B*9.2KB at default_128), bounding B at ~2048 per call; bigger batches
    are chunked by the caller.  Bit-exact vs every other backend."""
    batch, k1, n = acc0.shape
    steps, r_dim = bk_u32.shape[0], bk_u32.shape[1]
    assert 1 <= key_limbs <= NUM_LIMBS
    if batch_tile is None:
        bt = next(t for t in range(min(batch, 512), 0, -1) if batch % t == 0)
    else:
        bt = batch_tile
    assert batch % bt == 0, (batch, bt)
    n_tiles = batch // bt

    acc0_tiles = jnp.swapaxes(acc0.reshape(n_tiles, bt, k1, n), 1, 2)
    # exponent blocks for step s+1, padded with one zero block so the final
    # step's (unused) staging reads in bounds
    a_pad = jnp.concatenate(
        [a_hat, jnp.zeros((1,) + a_hat.shape[1:], a_hat.dtype)], axis=0
    )
    a_tiles = a_pad.reshape(steps + 1, n_tiles, bt, 1)
    a0 = a_hat[0].reshape(n_tiles, bt, 1)
    bk_flat = bk_u32.reshape(steps, r_dim * k1, n)
    out = pl.pallas_call(
        functools.partial(_kernel_pipe, params=params, bt=bt,
                          n_tiles=n_tiles, key_limbs=key_limbs),
        grid=(steps, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, bt, 1), lambda s, t: (s + 1, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), lambda s, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, k1, bt, n), lambda s, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_dim * k1, n), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_tiles, k1, bt, n), lambda s, t: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k1, bt, n), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r_dim * k1 * key_limbs, n, n), jnp.int8),
            pltpu.VMEM((2, n_tiles, r_dim, bt, n), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * batch * r_dim * k1 * n * n * key_limbs,
            bytes_accessed=steps * r_dim * k1 * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_tiles, a0, acc0_tiles, bk_flat)
    return jnp.swapaxes(out, 1, 2).reshape(batch, k1, n)


@functools.partial(
    jax.jit,
    static_argnames=("params", "interpret", "batch_tile", "key_limbs",
                     "skip_expand", "skip_digits", "wide", "balanced"),
)
def blind_rotate_fused(params: TfheParams, acc0, bk_u32, a_hat, interpret=False,
                       batch_tile: int | None = None, key_limbs: int = NUM_LIMBS,
                       skip_expand: bool = False, skip_digits: bool = False,
                       wide: bool = True, balanced: bool = False):
    """acc0 u32[B, k+1, N], bk u32[n, R, k+1, N], a_hat int32[n, B] -> final acc.

    The whole batch stays VMEM-resident ([T, k+1, bt, N] in/out blocks) and
    the Toeplitz scratch is R*(k+1)*key_limbs*N*N int8 (~57MB at default_128
    with the exact 4-limb key); the acc window is input/output-aliased, so
    B<=4096 fits the 128MB VMEM at the default bt=512.  Bigger batches are
    chunked by the caller (models/bootstrap.py:blind_rotate).

    ``wide=True`` (default) uses the wide-dot kernel (see ``_kernel_wide``);
    ``wide=False`` keeps the original per-plane kernel, which also carries
    the skip_expand/skip_digits timing probes.

    ``balanced=True`` (impl='fusedb', wide kernel only) swaps the reference
    carry-chain decomposition for the closed-form balanced digits
    (``_decompose_balanced_int8``): still exact mod-2^32 arithmetic with
    the identical reconstruction, but a different (smaller-bound) digit
    convention — bit-exact vs the XLA balanced scan, NOT vs the reference
    chain.

    ``key_limbs=4`` (default) is the exact mod-2^32 path, bit-identical to
    the scan backends.  ``key_limbs=3`` truncates the low key byte with
    rounding — an *approximate* mode cutting MXU work 25%: the truncation
    noise per bootstrap has std ~= sqrt(722 * R*N * E[d^2] * 2^14/12) ~= 2^20,
    vs Delta/2 = 2^28 at default_128 — negligible against the scheme's own
    noise (measured: see ARTIFACTS/default128_check.json).  Not bit-exact to
    the reference; gate outputs still decode identically.
    """
    batch, k1, n = acc0.shape
    steps, r_dim = bk_u32.shape[0], bk_u32.shape[1]
    assert 1 <= key_limbs <= NUM_LIMBS
    if skip_expand or skip_digits:
        wide = False  # probes live in the narrow kernel only
    assert not (balanced and not wide), "balanced digits: wide kernel only"
    wide_cap, narrow_cap, vmem_limit = _tuning()
    if batch_tile is None:
        # largest divisor of batch <= the per-generation sweet spot
        # (_GEN_TUNING: bigger M amortizes the MXU weight-load latency;
        # bt=1024 exceeds the scoped-VMEM budget)
        cap = wide_cap if wide else narrow_cap
        bt = next(t for t in range(min(batch, cap), 0, -1) if batch % t == 0)
    else:
        bt = batch_tile
    assert batch % bt == 0, (batch, bt)
    n_tiles = batch // bt

    # [T, k+1, bt, N]: batch-tile on an untiled leading dim
    acc0_tiles = jnp.swapaxes(acc0.reshape(n_tiles, bt, k1, n), 1, 2)
    # [n, T, bt, 1]: per-(step, tile) exponent blocks, DMA'd one per grid step
    # (a whole-resident [n*T, bt, 1] array lane-pads the size-1 trailing dim
    # 128x -> 378MB of VMEM at default_128/B=1024; streaming pads one block)
    a_tiles = a_hat.reshape(steps, n_tiles, bt, 1)
    bk_flat = bk_u32.reshape(steps, r_dim * k1, n)  # rows (r, col) flattened
    if wide:
        kern = functools.partial(_kernel_wide, params=params, bt=bt,
                                 n_tiles=n_tiles, key_limbs=key_limbs,
                                 balanced=balanced)
        scratch = pltpu.VMEM((r_dim * n, k1 * key_limbs * n), jnp.int8)
    else:
        kern = functools.partial(_kernel, params=params, bt=bt,
                                 n_tiles=n_tiles, key_limbs=key_limbs,
                                 skip_expand=skip_expand,
                                 skip_digits=skip_digits)
        scratch = pltpu.VMEM((r_dim * k1 * key_limbs, n, n), jnp.int8)
    out = pl.pallas_call(
        kern,
        grid=(steps, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, bt, 1), lambda s, t: (s, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, k1, bt, n), lambda s, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_dim * k1, n), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_tiles, k1, bt, n), lambda s, t: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k1, bt, n), jnp.uint32),
        scratch_shapes=[scratch],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # per-generation budget (_GEN_TUNING): B=4096/bt=512 wide needs
            # 120.2MB of scoped VMEM (acc windows + Toeplitz scratch +
            # dp_cat/comb temps); measured OK on v5e at 125MB
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * batch * r_dim * k1 * n * n * key_limbs,
            bytes_accessed=steps * r_dim * k1 * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_tiles, acc0_tiles, bk_flat)
    return jnp.swapaxes(out, 1, 2).reshape(batch, k1, n)
