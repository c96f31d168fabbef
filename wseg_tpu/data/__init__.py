from wseg_tpu.data.voc12 import (
    CAT_LIST,
    VOC12ClsDataset,
    VOC12ImageDataset,
    VOC12ClsDatasetMSF,
    VOC12AffDataset,
    load_img_name_list,
)
