"""Multi-HOST execution: jax.distributed bootstrap + a prover that runs
one jitted sharded step over a mesh spanning several processes.

The reference saturates one machine with Rayon (reference:
Cargo.toml:25-30, src/circom/qap.rs:37-44); scaling past one host there
means nothing — the TPU-native replacement must bootstrap a multi-process
runtime (one process per TPU host on a pod slice, DCN between hosts, ICI
within). This module owns that bootstrap:

- ``initialize()``       — jax.distributed.initialize wrapper
- ``global_mesh()``      — 1-D mesh over every global device (process-major)
- ``two_level_mesh()``   — (dcn, shards) mesh: outer axis across hosts,
                           inner axis across each host's local devices, so
                           collectives over "shards" ride ICI and only the
                           small window-sum folds cross DCN
- ``prove_multihost()``  — full Groth16 prove where the five MSMs are
                           sharded over the global mesh; every process
                           receives the replicated window sums and
                           assembles the identical proof

Validated without real pods by ``dist_dryrun`` (CLI: `dist-dryrun
--processes N`): N localhost CPU processes, a real coordination service on
127.0.0.1, proofs cross-checked bit-exact against the single-host prover.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: Optional[int] = None,
    platform: Optional[str] = None,
) -> None:
    """Bootstrap this process into the jax.distributed runtime.

    Call ONCE per process before any device use. On a real pod slice the
    three arguments come from the cluster scheduler (or are auto-detected
    by jax.distributed on TPU VMs); for CPU testing pass 127.0.0.1:<port>
    and a per-process device count.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if local_device_count is not None:
        # CPU testing: carve N virtual devices out of this process.
        jax.config.update("jax_num_cpu_devices", int(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """1-D mesh over all global devices, process-major (jax.devices() is
    already sorted by process index)."""
    import jax
    from jax.sharding import Mesh

    from .mesh import SHARD_AXIS

    devs = np.array(jax.devices())
    n = len(devs)
    if n & (n - 1):
        n = 1 << (n.bit_length() - 1)
        devs = devs[:n]
    return Mesh(devs, (SHARD_AXIS,))


DCN_AXIS = "dcn"


def two_level_mesh():
    """(dcn, shards) mesh: rows = processes (hosts), cols = local devices.

    Shardings that use P((DCN_AXIS, SHARD_AXIS)) split data across every
    device while keeping the inner collectives on ICI; cross-host traffic
    is limited to the outer reduction of already-reduced partials (the
    window sums), which is exactly the traffic DCN can afford.
    """
    import jax
    from jax.sharding import Mesh

    from .mesh import SHARD_AXIS

    procs = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per = len(devs) // procs
    grid = np.array(devs[: procs * per]).reshape(procs, per)
    return Mesh(grid, (DCN_AXIS, SHARD_AXIS))


# ---------------------------------------------------------------------------
# multi-process prover
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MultihostProver:
    dpk: object
    mesh: object
    window_bits: int
    step: object  # jitted global-step: sharded (xs, ys, sc) pytrees -> sums
    _staged: tuple  # device-resident sharded key arrays


def build_multihost_prover(dpk, mesh, window_bits: Optional[int] = None):
    """Compile the five-MSM window-sum step over a (possibly multi-process)
    mesh.

    Differences from the single-process prove_sharded: every large array is
    explicitly jax.device_put with a NamedSharding BEFORE entering jit (a
    multi-process pjit cannot consume single-device-committed arrays), and
    the witness map runs replicated per process (its domain-sized tensors
    are small next to the query sections; the distributed NTT variant
    remains single-process until domains exceed one host).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import groth16_jax as gj
    from ..ops import curve_jax as cj
    from ..ops import msm as msm_ops
    from ..ops import segments
    from .mesh import SHARD_AXIS

    if window_bits is None:
        window_bits = gj.default_window_bits()
    axes = tuple(mesh.axis_names)
    # shard over every mesh axis: on a two-level mesh the leading (dcn)
    # axis splits across hosts, the trailing (shards) axis across ICI
    shard_spec = P(None, axes)  # arrays are (stack, N, ...) — split N
    shard_spec_g2 = P(axes)
    D = int(np.prod([mesh.shape[a] for a in axes]))

    n_max = dpk.g1_stack_x.shape[1]
    n_pad = -(-n_max // D) * D
    g2_len = dpk.b_g2_query[0].shape[0]
    g2_pad = -(-g2_len // D) * D

    def pad_np(arr, target, axis):
        arr = np.asarray(arr)
        pads = [(0, 0)] * arr.ndim
        pads[axis] = (0, target - arr.shape[axis])
        return np.pad(arr, pads)

    g1_x = pad_np(dpk.g1_stack_x, n_pad, 1)
    g1_y = pad_np(dpk.g1_stack_y, n_pad, 1)
    g2_x = pad_np(dpk.b_g2_query[0], g2_pad, 0)
    g2_y = pad_np(dpk.b_g2_query[1], g2_pad, 0)

    sh_g1 = NamedSharding(mesh, shard_spec)
    sh_g2 = NamedSharding(mesh, shard_spec_g2)
    repl = NamedSharding(mesh, P())

    staged = (
        jax.device_put(g1_x, sh_g1),
        jax.device_put(g1_y, sh_g1),
        jax.device_put(g2_x, sh_g2),
        jax.device_put(g2_y, sh_g2),
    )

    def step(g1_xs, g1_ys, g2_xs, g2_ys, sc_g1, sc_g2):
        from .mesh import shmap

        def g1_body(xs, ys, sc):
            # A/B1 share the assignment scalars -> one argsort for both
            # local shards (same sharing as the single-chip core).
            la, lb1 = dpk.g1_lengths[0], dpk.g1_lengths[1]
            if (n_pad // D) <= msm_ops.CHUNK_POINTS:
                oa, ka = msm_ops.window_orders(sc[0], window_bits)
                ob1, kb1 = (
                    (oa, ka) if lb1 == la
                    else msm_ops.window_orders(sc[1], window_bits)
                )
                ol, kl = msm_ops.window_orders(sc[2], window_bits)
                oh, kh = msm_ops.window_orders(sc[3], window_bits)
                orders = jnp.stack([oa, ob1, ol, oh])
                keys = jnp.stack([ka, kb1, kl, kh])

                def one(args):
                    x, y, s, o, k = args
                    return msm_ops.window_sums_affine_impl(
                        cj.FQ_ADAPTER, x, y, s, window_bits, precomp=(o, k)
                    )

                sums = jax.lax.map(one, (xs, ys, sc, orders, keys))
            else:

                def one(args):
                    x, y, s = args
                    return msm_ops.window_sums_affine_impl(
                        cj.FQ_ADAPTER, x, y, s, window_bits
                    )

                sums = jax.lax.map(one, (xs, ys, sc))
            gathered = jax.lax.all_gather(sums, axes, tiled=False)
            return segments.tree_fold(
                lambda a, b: cj.proj_add(cj.FQ_ADAPTER, a, b), gathered, D
            )

        def g2_body(xs, ys, sc):
            sums = msm_ops.window_sums_affine_impl(
                cj.FQ2_ADAPTER, xs, ys, sc, window_bits
            )
            gathered = jax.lax.all_gather(sums, axes, tiled=False)
            return segments.tree_fold(
                lambda a, b: cj.proj_add(cj.FQ2_ADAPTER, a, b), gathered, D
            )

        g1_sm = shmap(
            g1_body, mesh=mesh,
            in_specs=(shard_spec, shard_spec, shard_spec), out_specs=P(),
        )
        g2_sm = shmap(
            g2_body, mesh=mesh,
            in_specs=(shard_spec_g2, shard_spec_g2, shard_spec_g2),
            out_specs=P(),
        )
        return g1_sm(g1_xs, g1_ys, sc_g1), g2_sm(g2_xs, g2_ys, sc_g2)

    jit_step = jax.jit(
        step,
        in_shardings=(sh_g1, sh_g1, sh_g2, sh_g2, sh_g1, sh_g2),
        out_shardings=(repl, repl),
    )

    # AOT-compile NOW, then barrier on the coordination service: per-process
    # compile skew is minutes, and a process that reaches the first
    # collective early times out initializing its gloo context (30 s KV
    # wait) while its peers are still in XLA.
    sc1_spec = jax.ShapeDtypeStruct((4, n_pad, 16), np.uint32, sharding=sh_g1)
    sc2_spec = jax.ShapeDtypeStruct((g2_pad, 16), np.uint32, sharding=sh_g2)
    compiled = jit_step.lower(*staged, sc1_spec, sc2_spec).compile()
    _coordination_barrier("multihost_prover_compiled")

    return MultihostProver(
        dpk=dpk, mesh=mesh, window_bits=window_bits, step=compiled,
        _staged=staged,
    )


def _coordination_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Process barrier over the jax.distributed coordination service (plain
    gRPC — usable even before any device collective has run)."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def prove_multihost(prover: MultihostProver, r: int, s: int, full_assignment):
    """Witness map replicated per process (host NTT path), MSM window sums
    over the global mesh, identical proof assembled on every process."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..constants import R_SCALAR
    from ..models import groth16_jax as gj
    from ..ops import field_jax as fj

    dpk = prover.dpk
    mesh = prover.mesh
    axes = mesh.axis_names
    D = int(np.prod([mesh.shape[a] for a in axes]))
    n_max = dpk.g1_stack_x.shape[1]
    n_pad = -(-n_max // D) * D
    g2_len = dpk.b_g2_query[0].shape[0]
    g2_pad = -(-g2_len // D) * D

    assignment = [int(a) % R_SCALAR for a in full_assignment]
    asg_plain = np.asarray(fj.encode_plain(assignment))

    # Witness map on each process's local default device (replicated work,
    # deterministic): h scalars in plain form.
    with jax.default_device(jax.local_devices()[0]):
        asg_dev = jnp.asarray(asg_plain)
        asg_mont = fj.to_mont_impl(fj.FR, asg_dev)
        h_mont = gj._witness_map_mont(dpk, asg_mont)
        h_plain = fj.from_mont_impl(fj.FR, h_mont)
        sc = gj._scalar_stack(dpk, asg_dev, h_plain)  # (4, n_max, 16)
        sc_np = np.asarray(sc)

    sc_np = np.pad(sc_np, ((0, 0), (0, n_pad - n_max), (0, 0)))
    sc2_np = np.pad(
        asg_plain[:g2_len],
        ((0, g2_pad - min(g2_len, asg_plain.shape[0])), (0, 0)),
    )

    sh_g1 = NamedSharding(mesh, P(None, axes))
    sh_g2 = NamedSharding(mesh, P(axes))
    sc_dev = jax.device_put(sc_np, sh_g1)
    sc2_dev = jax.device_put(sc2_np, sh_g2)

    g1_xs, g1_ys, g2_xs, g2_ys = prover._staged
    g1_sums, g2_sums = prover.step(g1_xs, g1_ys, g2_xs, g2_ys, sc_dev, sc2_dev)
    g1_sums = jax.tree_util.tree_map(np.asarray, g1_sums)
    g2_sums = jax.tree_util.tree_map(np.asarray, g2_sums)
    return gj.assemble_proof(dpk, r, s, g1_sums, g2_sums, prover.window_bits)


# ---------------------------------------------------------------------------
# localhost dryrun (the driver/CI entry)
# ---------------------------------------------------------------------------


def dist_worker_main(
    process_id: int,
    num_processes: int,
    coordinator: str,
    local_devices: int,
    out_path: str,
    chain_k: int = 62,
    two_level: bool = False,
) -> None:
    """Body of one `dist-worker` process: bootstrap, prove, dump proof."""
    import json

    from ..models import generate_parameters
    from ..models.groth16_jax import DeviceProvingKey
    from ..utils import paths
    from ..utils.chain import chain_circuit

    paths.enable_compile_cache()
    initialize(
        coordinator, num_processes, process_id,
        local_device_count=local_devices, platform="cpu",
    )
    import jax

    assert jax.process_count() == num_processes

    circuit = chain_circuit(k=chain_k, a=3)
    pk = generate_parameters(
        circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
    )
    ma, mb, _ = circuit.to_matrices()
    dpk = DeviceProvingKey.from_matrix_rows(
        pk, ma, mb, circuit.r1cs.num_inputs, len(ma)
    )
    mesh = two_level_mesh() if two_level else global_mesh()
    prover = build_multihost_prover(dpk, mesh, window_bits=8)
    proof = prove_multihost(prover, 0xAA, 0xBB, circuit.full_assignment())

    record = {
        "process_id": process_id,
        "devices": len(jax.devices()),
        "processes": jax.process_count(),
        "mesh": {a: int(mesh.shape[a]) for a in mesh.axis_names},
        "proof": {
            "a": [str(c) for c in proof.a],
            "b": [[str(c) for c in pair] for pair in proof.b],
            "c": [str(c) for c in proof.c],
        },
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh)
    # Align process exits: without this, per-process compile skew can leave
    # one worker minutes behind and the distributed runtime's shutdown
    # barrier (60 s) fails even though every proof already landed.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dist_dryrun done")


def dist_dryrun(
    num_processes: int = 2,
    local_devices: int = 2,
    chain_k: int = 62,
    two_level: bool = False,
    timeout: float = 900.0,
) -> dict:
    """Launch N localhost worker processes, wait, and cross-check that all
    proofs are identical AND equal to the single-host host-backend proof.

    Returns the consensus record. Raises on any worker failure/mismatch.
    """
    import json
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    from ..constants import R_SCALAR  # noqa: F401  (host check below)
    from ..models import Groth16, generate_parameters
    from ..utils.chain import chain_circuit

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    tmp = tempfile.mkdtemp(prefix="dist_dryrun_")
    outs = [os.path.join(tmp, f"proof_{i}.json") for i in range(num_processes)]
    code = (
        "import sys\n"
        "from circom_compat_tpu.parallel.multihost import dist_worker_main\n"
        "dist_worker_main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],\n"
        "                 int(sys.argv[4]), sys.argv[5], int(sys.argv[6]),\n"
        "                 bool(int(sys.argv[7])))\n"
    )
    env = dict(os.environ)
    # Device count comes from jax_num_cpu_devices; the collective timeout
    # must outlive per-process COMPILE skew (the first process to finish
    # compiling jit_step waits inside the gloo rendezvous — default 30 s —
    # while its peers are still compiling for minutes).
    env["XLA_FLAGS"] = (
        "--xla_cpu_collective_timeout_seconds=1200 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
    # Gloo (XLA:CPU's cross-process collectives) must ride loopback here —
    # its default interface pick is unroutable in sandboxed containers.
    env.setdefault("GLOO_SOCKET_IFNAME", "lo")
    # XLA:CPU's deserialize_executable re-does codegen, so cache READS of
    # the big sharded step are SLOWER than a cold compile (the measured
    # lesson in utils/paths.enable_compile_cache) — and N workers would
    # also race writing the same entries. Cold-compile every worker.
    env["CIRCOM_TPU_NO_COMPILE_CACHE"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i), str(num_processes),
             coordinator, str(local_devices), outs[i], str(chain_k),
             str(int(two_level))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(num_processes)
    ]
    failures = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            failures.append((i, "timeout", err.decode()[-2000:]))
            continue
        if p.returncode != 0:
            failures.append((i, f"rc={p.returncode}", err.decode()[-2000:]))
    if failures:
        raise RuntimeError(f"dist workers failed: {failures}")

    records = []
    for path in outs:
        with open(path) as fh:
            records.append(json.load(fh))
    proofs = [r["proof"] for r in records]
    if any(p != proofs[0] for p in proofs[1:]):
        raise RuntimeError("worker proofs disagree")

    # cross-check against the pure-host backend
    circuit = chain_circuit(k=chain_k, a=3)
    pk = generate_parameters(
        circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
    )
    ma, mb, _ = circuit.to_matrices()

    class _Rows:
        def __init__(self, a, b, ni):
            self.a, self.b, self.num_instance_variables = a, b, ni

    host = Groth16.create_proof_with_reduction_and_matrices(
        pk, 0xAA, 0xBB, _Rows(ma, mb, circuit.r1cs.num_inputs),
        circuit.r1cs.num_inputs, len(ma), circuit.full_assignment(),
        backend="host",
    )
    want = {
        "a": [str(c) for c in host.a],
        "b": [[str(c) for c in pair] for pair in host.b],
        "c": [str(c) for c in host.c],
    }
    if proofs[0] != want:
        raise RuntimeError("multi-process proof != host proof")
    return records[0]
