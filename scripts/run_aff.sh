#!/usr/bin/env bash
# Stage-2: CRF label prep, AffinityNet training, random-walk refinement —
# rebuild of the aff_* stages of script/script_contrast.sh.
set -euo pipefail

DATASET_ROOT=${DATASET_ROOT:-VOC2012}
SESSION=${SESSION:-resnet38_contrast}
AFF_SESSION=${AFF_SESSION:-${SESSION}_aff}
LA=${LA:-4.00}
HA=${HA:-24.00}

python -m wseg_tpu.cli.aff_prepare \
    --infer_list voc12/train_aug.txt \
    --voc12_root "${DATASET_ROOT}" \
    --cam_dir "result/${SESSION}/cam" \
    --out_crf "result/${SESSION}/crf_aff"

python -m wseg_tpu.cli.aff_train \
    --session_name "${AFF_SESSION}" \
    --voc12_root "${DATASET_ROOT}" \
    --weights "result/${SESSION}/contrast.ckpt" \
    --la_crf_dir "result/${SESSION}/crf_aff/${LA}" \
    --ha_crf_dir "result/${SESSION}/crf_aff/${HA}"

python -m wseg_tpu.cli.aff_infer \
    --weights "result/${AFF_SESSION}/aff.ckpt" \
    --infer_list voc12/train_aug.txt \
    --cam_dir "result/${SESSION}/cam" \
    --voc12_root "${DATASET_ROOT}" \
    --out_rw "result/${AFF_SESSION}/rw"

python -m wseg_tpu.cli.eval \
    --list "${DATASET_ROOT}/ImageSets/Segmentation/train.txt" \
    --predict_dir "result/${AFF_SESSION}/rw" \
    --gt_dir "${DATASET_ROOT}/SegmentationClass" \
    --comment "${AFF_SESSION} rw" \
    --logfile "result/${AFF_SESSION}/evallog.txt"
