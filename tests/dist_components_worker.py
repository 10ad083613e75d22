"""Child process for the two-process per-component dispatch test.

Usage: python dist_components_worker.py <coord> <nprocs> <pid> <data_dir>
       <out_dir>

Each process initializes multi-controller JAX on CPU and runs the FULL
pipeline with --per-component on the shared dataset. The preprocessing
stages are deterministic and replicated; at the extraction stage the
components are sharded round-robin across processes and the strain
dicts exchanged (parallel/components.run_components_multihost), so both
processes must write identical strain.fasta files into their own output
directories.
"""

import os
import sys


def main():
    coord, nprocs, pid, data_dir, out_dir = sys.argv[1:6]
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")

    import logging

    from types import SimpleNamespace

    from vstrains_tpu import pipeline
    from vstrains_tpu.parallel.distributed import init_distributed

    init_distributed(coordinator_address=coord,
                     num_processes=int(nprocs), process_id=int(pid))

    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    logging.basicConfig(level=logging.INFO)
    args = SimpleNamespace(
        gfa_file=os.path.join(
            data_dir, "assembly_graph_after_simplification.gfa"),
        path_file=os.path.join(data_dir, "contigs.paths"),
        fwd=os.path.join(data_dir, "reads_1.fastq"),
        rve=os.path.join(data_dir, "reads_2.fastq"),
        output_dir=out_dir, min_cov=None, min_len=250, dev=False,
        pe_batch_size=256, resume=False, per_component=True,
        component_workers=1)
    pipeline.run(args, logging.getLogger("dist-comp"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
