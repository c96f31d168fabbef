#!/usr/bin/env bash
# Stage-3: DeepLab retraining on the random-walk pseudo masks + MSF/CRF test.
set -euo pipefail

DATASET_ROOT=${DATASET_ROOT:-VOC2012}
SESSION=${SESSION:-resnet38_contrast}
AFF_SESSION=${AFF_SESSION:-${SESSION}_aff}
EXP=${EXP:-SEAM_deeplabv1_resnet38}

python -m wseg_tpu.cli.seg_train \
    --exp "${EXP}" \
    --data_root "${DATASET_ROOT}" \
    --pseudo_gt "result/${AFF_SESSION}/rw" \
    --backbone_weights "result/${SESSION}/contrast.ckpt"

CKPT=$(ls model/${EXP}/*_all.ckpt | tail -1)
python -m wseg_tpu.cli.seg_test \
    --exp "${EXP}" \
    --data_root "${DATASET_ROOT}" \
    --ckpt "${CKPT}"
