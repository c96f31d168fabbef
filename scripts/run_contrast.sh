#!/usr/bin/env bash
# End-to-end stage-1+2 pipeline — rebuild of script/script_contrast.sh.
# Env: DATASET_ROOT (VOC2012 dir), WEIGHT_ROOT (pretrained weights dir),
# SESSION (session name). TPU chips are auto-discovered (no GPU= var needed:
# the mesh spans all local chips).
set -euo pipefail

DATASET_ROOT=${DATASET_ROOT:-VOC2012}
WEIGHT_ROOT=${WEIGHT_ROOT:-weights}
SESSION=${SESSION:-resnet38_contrast}
BACKBONE_WEIGHTS=${BACKBONE_WEIGHTS:-${WEIGHT_ROOT}/ilsvrc-cls_rna-a1_cls1000_ep-0001.pth}

# 1. train SEAM + pixel-to-prototype contrast
python -m wseg_tpu.cli.contrast_train \
    --session_name "${SESSION}" \
    --voc12_root "${DATASET_ROOT}" \
    --weights "${BACKBONE_WEIGHTS}"

# 2. multi-scale+flip CAM inference on train (seed eval) and train_aug (stage 2)
python -m wseg_tpu.cli.contrast_infer \
    --weights "result/${SESSION}/contrast.ckpt" \
    --infer_list voc12/train.txt \
    --voc12_root "${DATASET_ROOT}" \
    --out_cam "result/${SESSION}/cam" \
    --out_crf "result/${SESSION}/crf"

# 3. seed evaluation with bg-threshold curve
python -m wseg_tpu.cli.eval \
    --list "${DATASET_ROOT}/ImageSets/Segmentation/train.txt" \
    --predict_dir "result/${SESSION}/cam" \
    --gt_dir "${DATASET_ROOT}/SegmentationClass" \
    --comment "${SESSION} seed" --type npy --curve True \
    --logfile "result/${SESSION}/evallog.txt"
