#!/bin/bash
# End-to-end nested-glass pipeline (docs/nested_walkthrough.md).
# Usage:
#   tools/run_nested_pipeline.sh front              # synth + stage-1 + outer mesh + score
#   tools/run_nested_pipeline.sh stage2 <timeout_s> # train stage-2 (resumes), then
#                                                   # extract+postprocess+score inner mesh
# stage2 is resumable: run it again with another time budget and it picks up
# from the latest checkpoint (trainer saves every save_interval=2000 steps),
# re-extracting and re-scoring at every pause point.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

front() {
  python -m nunerf_tpu.cli synth-scene --output ./datasets/nested
  echo "=== stage-1 train ==="
  python -m nunerf_tpu.cli train --cfg configs/shape/nerf/nested.yaml
  echo "=== extract outer mesh ==="
  python -m nunerf_tpu.cli extract-mesh-stage1 --cfg configs/shape/nerf/nested.yaml --resolution 512
  echo "=== eval outer geometry ==="
  python -m nunerf_tpu.cli eval-geometry \
      --mesh data/meshes/nested-30000_simplified.ply --gt datasets/nested/gt_outer.npy
  echo "=== stage-1 test-split eval ==="
  python -m nunerf_tpu.cli eval-images --cfg configs/shape/nerf/nested.yaml --split test
}

stage2() {
  local budget="${1:?usage: stage2 <timeout_s>}"
  echo "=== stage-2 train (budget ${budget}s) ==="
  timeout "$budget" python -m nunerf_tpu.cli train --cfg configs/stage2/nerf/nested.yaml
  echo "=== extract inner mesh (latest ckpt) ==="
  python -m nunerf_tpu.cli extract-mesh-stage2 --cfg configs/stage2/nerf/nested.yaml --resolution 256
  local inner
  inner=$(ls -t data/meshes/nested_s2-*-inner.ply | head -1)
  python -m nunerf_tpu.cli postprocess-stage2 \
      --input "$inner" --outer data/meshes/nested-30000_simplified.ply
  echo "=== eval inner geometry ==="
  python -m nunerf_tpu.cli eval-geometry \
      --mesh "${inner%.ply}_post.ply" --gt datasets/nested/gt_inner.npy
  echo "=== stage-2 test-split eval (all 8 test views) ==="
  python -m nunerf_tpu.cli eval-images --cfg configs/stage2/nerf/nested.yaml --split test
}

shell_front() {
  # hollow-glass variant: stage-1 + outer mesh (shorter schedule)
  python -m nunerf_tpu.cli synth-scene --output ./datasets/nested_shell --shell
  echo "=== shell stage-1 train ==="
  python -m nunerf_tpu.cli train --cfg configs/shape/nerf/nested_shell.yaml
  echo "=== shell extract outer mesh ==="
  python -m nunerf_tpu.cli extract-mesh-stage1 --cfg configs/shape/nerf/nested_shell.yaml --resolution 512
  # keep only the outside-visible surface (hollow scenes also march junk on
  # the interior object; stage-2 must see the OUTER interface)
  python -m nunerf_tpu.cli postprocess-outer --input data/meshes/nested_shell-30000_simplified.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh data/meshes/nested_shell-30000_simplified_outer.ply --gt datasets/nested_shell/gt_outer.npy
  echo "=== shell stage-1 test-split eval ==="
  python -m nunerf_tpu.cli eval-images --cfg configs/shape/nerf/nested_shell.yaml --split test
}

shell_stage2() {
  local budget="${1:?usage: shell_stage2 <timeout_s>}"
  echo "=== shell stage-2 train (budget ${budget}s) ==="
  timeout "$budget" python -m nunerf_tpu.cli train --cfg configs/stage2/nerf/nested_shell.yaml
  echo "=== learned IoR/thickness vs GT + inner mesh ==="
  python tools/eval_shell.py --cfg configs/stage2/nerf/nested_shell.yaml \
      --meta datasets/nested_shell/meta.json
  python -m nunerf_tpu.cli extract-mesh-stage2 --cfg configs/stage2/nerf/nested_shell.yaml --resolution 256
  local inner
  inner=$(ls -t data/meshes/nested_shell_s2-*-inner.ply | head -1)
  python -m nunerf_tpu.cli postprocess-stage2 \
      --input "$inner" --outer data/meshes/nested_shell-30000_simplified_outer.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh "${inner%.ply}_post.ply" --gt datasets/nested_shell/gt_inner.npy
  echo "=== shell stage-2 test-split eval ==="
  python -m nunerf_tpu.cli eval-images --cfg configs/stage2/nerf/nested_shell.yaml --split test
}

shell_stage2b() {
  # round-5b: absorption-gated shell stage-2 (fresh run; see
  # configs/stage2/nerf/nested_shell_b.yaml)
  local budget="${1:?usage: shell_stage2b <timeout_s>}"
  timeout "$budget" python -m nunerf_tpu.cli train --cfg configs/stage2/nerf/nested_shell_b.yaml
  python tools/eval_shell.py --cfg configs/stage2/nerf/nested_shell_b.yaml \
      --meta datasets/nested_shell/meta.json
  python -m nunerf_tpu.cli extract-mesh-stage2 --cfg configs/stage2/nerf/nested_shell_b.yaml --resolution 256
  local inner
  inner=$(ls -t data/meshes/nested_shell_s2b-*-inner.ply | head -1)
  python -m nunerf_tpu.cli postprocess-stage2 \
      --input "$inner" --outer data/meshes/nested_shell-30000_simplified_outer.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh "${inner%.ply}_post.ply" --gt datasets/nested_shell/gt_inner.npy
  python -m nunerf_tpu.cli eval-images --cfg configs/stage2/nerf/nested_shell_b.yaml --split test
}

real_front() {
  # capture-style (COLMAP/CustomDatabase) hollow-glass scene: stage-1 with
  # the real conventions (NeRO rays, sphere_direction, normal_ori), outer
  # mesh, then the mask pipeline stage-2 consumes (get_mask: true)
  if [ ! -d datasets/nested_real ]; then
    python -m nunerf_tpu.cli synth-scene --output ./datasets/nested_real --colmap --shell --n-train 56
  fi
  echo "=== real stage-1 train ==="
  python -m nunerf_tpu.cli train --cfg configs/shape/real/nested_real.yaml
  echo "=== real extract outer mesh ==="
  python -m nunerf_tpu.cli extract-mesh-stage1 --cfg configs/shape/real/nested_real.yaml --resolution 384
  python -m nunerf_tpu.cli postprocess-outer --input data/meshes/nested_real-20000_simplified.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh data/meshes/nested_real-20000_simplified_outer.ply --gt datasets/nested_real/gt_outer.npy
  echo "=== mask pipeline ==="
  python -m nunerf_tpu.cli render-mask --cfg configs/shape/real/nested_real.yaml \
      --mesh_path data/meshes/nested_real-20000_simplified_outer.ply
  python -m nunerf_tpu.cli mask-erosion --cfg configs/shape/real/nested_real.yaml
}

res1024() {
  # Reference stage-1 extraction contract: marching res 1024
  # (extract_mesh_stage1.py:56); --tag keeps it from clobbering the meshes
  # the 512-res legs produced.  The follow-up render-mask on the RAW mesh
  # drives the scaled tile index at production (multi-million-tri) sizes.
  echo "=== res-1024 stage-1 extraction ==="
  python -m nunerf_tpu.cli extract-mesh-stage1 --cfg configs/shape/nerf/nested.yaml --resolution 1024 --tag r1024
  echo "=== full-res render-mask on the raw res-1024 mesh ==="
  python -m nunerf_tpu.cli render-mask --cfg configs/shape/nerf/nested.yaml \
      --mesh_path data/meshes/nested-30000_r1024.ply
}

real_boot() {
  # round-5 bootstrap second pass (VERDICT item 1): the pass-1 mesh's own
  # silhouette under-covers the dissolved container (measured 49%), so the
  # acc target comes from the density-filtered COLMAP-cloud hull
  # (silhouette IoU 0.997 on this capture) at weight 0.5 — the proven
  # anti-dissolution fix — then masks are regenerated from the (good)
  # bootstrap mesh for stage-2.
  echo "=== silhouette prior masks (COLMAP-cloud hull) ==="
  python -m nunerf_tpu.cli silhouette-prior --cfg configs/shape/real/nested_real.yaml
  python -m nunerf_tpu.cli render-mask --cfg configs/shape/real/nested_real.yaml \
      --mesh_path data/meshes/nested_real_silhouette.ply
  echo "=== bootstrap stage-1 train (rawmask, weight 0.5) ==="
  python -m nunerf_tpu.cli train --cfg configs/shape/real/nested_real_boot.yaml
  echo "=== bootstrap extract outer mesh ==="
  python -m nunerf_tpu.cli extract-mesh-stage1 --cfg configs/shape/real/nested_real_boot.yaml --resolution 384
  python -m nunerf_tpu.cli postprocess-outer --input data/meshes/nested_real_boot-20000_simplified.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh data/meshes/nested_real_boot-20000_simplified_outer.ply --gt datasets/nested_real/gt_outer.npy
  echo "=== regenerate mask pipeline from bootstrap mesh ==="
  python -m nunerf_tpu.cli render-mask --cfg configs/shape/real/nested_real_boot.yaml \
      --mesh_path data/meshes/nested_real_boot-20000_simplified_outer.ply
  python -m nunerf_tpu.cli mask-erosion --cfg configs/shape/real/nested_real_boot.yaml
  echo "=== bootstrap stage-1 test-split eval (final model) ==="
  python -m nunerf_tpu.cli eval-images --cfg configs/shape/real/nested_real_boot.yaml --split test \
      --ckpt data/model/nested_real_boot/model.ckpt
}

real_boot_ext() {
  # appearance fine-tune extension of the bootstrap pass (resumes from the
  # 20k checkpoint under the extended 32k cosine), then re-extract + re-eval
  echo "=== bootstrap stage-1 extension train ==="
  python -m nunerf_tpu.cli train --cfg configs/shape/real/nested_real_boot.yaml
  python -m nunerf_tpu.cli extract-mesh-stage1 --cfg configs/shape/real/nested_real_boot.yaml --resolution 384
  python -m nunerf_tpu.cli postprocess-outer --input data/meshes/nested_real_boot-32000_simplified.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh data/meshes/nested_real_boot-32000_simplified_outer.ply --gt datasets/nested_real/gt_outer.npy
  python -m nunerf_tpu.cli eval-images --cfg configs/shape/real/nested_real_boot.yaml --split test \
      --ckpt data/model/nested_real_boot/model.ckpt
}

real_stage2() {
  local budget="${1:?usage: real_stage2 <timeout_s>}"
  echo "=== real shell stage-2 train (budget ${budget}s) ==="
  timeout "$budget" python -m nunerf_tpu.cli train --cfg configs/stage2/real/nested_real.yaml
  echo "=== learned IoR/thickness vs GT + inner mesh ==="
  python tools/eval_shell.py --cfg configs/stage2/real/nested_real.yaml \
      --meta datasets/nested_real/meta.json
  python -m nunerf_tpu.cli extract-mesh-stage2 --cfg configs/stage2/real/nested_real.yaml --resolution 256
  local inner
  inner=$(ls -t data/meshes/nested_real_s2-*-inner.ply | head -1)
  python -m nunerf_tpu.cli postprocess-stage2 \
      --input "$inner" --outer data/meshes/nested_real_boot-20000_simplified_outer.ply
  python -m nunerf_tpu.cli eval-geometry \
      --mesh "${inner%.ply}_post.ply" --gt datasets/nested_real/gt_inner.npy
  python -m nunerf_tpu.cli eval-images --cfg configs/stage2/real/nested_real.yaml --split test
}

real_stage2_fresh() {
  # rerun real stage-2 from scratch under the round-5 IoR inv_s gate
  # (the r5a run drifted to 1.17 with the fixed-step release)
  rm -rf data/model/nested_real_s2
  real_stage2 "$1"
}

"$@"
echo "PIPELINE LEG EXIT:$?"
