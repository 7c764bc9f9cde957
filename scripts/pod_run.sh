#!/usr/bin/env bash
# Multi-host (TPU pod / pod-slice) launch for macroc_tpu — the TPU-native
# counterpart of the reference's SLURM generators (scripts/launch_jobs.sh,
# scripts/scala/gen_inputs.sh: 96-768 MPI ranks at 100^3).
#
# Run THIS SAME SCRIPT on every host of the slice (e.g. with
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#       --command="MACROC_GRID=100 bash macroc_tpu/scripts/pod_run.sh"
# ); on GKE/TPU-VM pods jax.distributed auto-detects the topology, so no
# coordinator flags are needed.  On clusters without auto-detection set:
#   MACROC_COORDINATOR=<host0>:8476
#   MACROC_NUM_PROCESSES=<number of hosts>
#   MACROC_PROCESS_ID=<this host's index>          (e.g. from $SLURM_PROCID)
#
# Mesh placement rule (parallel/mesh.py): the mesh axes are ('x','y','z')
# with 'x' OUTERMOST, and jax.make_mesh orders devices so the outermost
# axis is the one that spans hosts — therefore the DCN-crossing halo is
# the two x-faces of each host's block.  Pick -da_processors_x = number of
# hosts (and y*z = chips per host) so:
#   * every y/z halo rides ICI,
#   * DCN carries ONE x-face pair per step side: ny*nz nodes * 3 dof * 4 B
#     per direction (e.g. 100^3 grid on 4 hosts: 100*100*3*4 B = 120 kB per
#     exchange — far under DCN bandwidth; the collectives that matter are
#     the CG allreduces, which are latency-bound scalars).
#
# Strong-scaling sweep (the reference's scala/ harness): run this script on
# 1, 2, 4, ... host counts with the same MACROC_GRID and extract the
# speedup exactly as gen_inputs.sh:36-42 did from the elapsed-time line:
#   t1=$(grep "Elapsed time" out_1host.log | awk '{print $4}')
#   tn=$(grep "Elapsed time" out_Nhost.log | awk '{print $4}')
#   echo "speedup at N hosts: $(echo "$t1 / $tn" | bc -l)"
set -euo pipefail
cd "$(dirname "$0")/.."

GRID=${MACROC_GRID:-100}          # nodes per direction (scala/ used 100^3)
TS=${MACROC_TS:-10}               # time steps (scala/ used 10)
HOSTS=${MACROC_NUM_PROCESSES:-}   # optional: pin -da_processors_x to hosts

PROC_FLAGS=()
if [[ -n "${HOSTS}" ]]; then
    PROC_FLAGS+=(-da_processors_x "${HOSTS}")
fi

exec python -m macroc_tpu \
    -da_grid_x "${GRID}" -da_grid_y "${GRID}" -da_grid_z "${GRID}" \
    -lx 50 -ly 50 -lz 50 \
    -ts "${TS}" -dt 0.001 \
    -bc_type 1 -rad 10 \
    -newton_max_its 4 \
    -checkpoint_freq 0 \
    -log_phases \
    "${PROC_FLAGS[@]}" \
    "$@"
