"""Multi-host (multi-process) initialization and smoke-run worker.

The reference is strictly single-process (SURVEY.md §2.8: no NCCL/MPI/
tf.distribute anywhere); the TPU-native equivalent is ``jax.distributed`` +
a process-spanning ``Mesh`` whose collectives ride ICI within a slice and
DCN across hosts (SURVEY.md §5 'Distributed communication backend').

:func:`initialize` is the guarded entry: a no-op for single-process runs,
explicit args or standard env fallbacks otherwise.  ``python -m
covid19uk_tpu.parallel.distributed`` is the per-process worker used by the
multi-process dry run (``__graft_entry__.dryrun_multichip(n, n_processes)``)
and the CI smoke test: it joins the coordinator, builds a global mesh over
every process's devices, runs one sharded MCMC step, and prints a checksum
that must agree across processes.
"""

import os

import jax

_ENV_COORDINATOR = "JAX_COORDINATOR_ADDRESS"
_ENV_NUM_PROCESSES = "JAX_NUM_PROCESSES"
_ENV_PROCESS_ID = "JAX_PROCESS_ID"


def is_distributed():
    """True once :func:`initialize` has connected this process."""
    return jax.process_count() > 1


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Guarded ``jax.distributed.initialize``.

    Single-process runs (no args, no env) are a no-op, so every driver/CLI
    can call this unconditionally.  Arguments fall back to the standard
    cluster env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID); on TPU pods jax auto-detects them from the metadata
    server, so bare ``initialize()`` also works there.

    Returns True if distributed mode was (already) initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        _ENV_COORDINATOR
    )
    if num_processes is None and _ENV_NUM_PROCESSES in os.environ:
        num_processes = int(os.environ[_ENV_NUM_PROCESSES])
    if process_id is None and _ENV_PROCESS_ID in os.environ:
        process_id = int(os.environ[_ENV_PROCESS_ID])

    if coordinator_address is None and num_processes is None:
        return jax.distributed.is_initialized()  # single-process: no-op
    if jax.distributed.is_initialized():
        return True
    # NOTE: must run before anything touches the XLA backend (jax.devices()
    # etc.) — do not query jax.process_count() here.

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def _worker_main(argv=None):
    """Per-process dry-run worker (see module docstring)."""
    from argparse import ArgumentParser

    parser = ArgumentParser(description="distributed dry-run worker")
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--local-devices", type=int, default=2)
    args = parser.parse_args(argv)

    # This environment's sitecustomize registers the (single-chip) axon
    # backend at interpreter startup, overriding JAX_PLATFORMS=cpu from the
    # env — re-pin to N virtual CPU devices before the backend initializes
    # (and before jax.distributed, which must precede any backend use).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, (
        jax.process_count(), args.num_processes
    )

    from covid19uk_tpu.parallel.dryrun import run_sharded_step

    checksum, info = run_sharded_step()
    # The parent greps this exact prefix and asserts cross-process equality.
    print(
        f"DISTRIBUTED_CHECKSUM process={args.process_id} "
        f"value={checksum:.10e} {info}",
        flush=True,
    )


if __name__ == "__main__":
    _worker_main()
