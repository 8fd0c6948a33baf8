from fedvit_tpu.data.constants import (  # noqa: F401
    VALID_CLASSES, NUM_CLASSES, LABEL_TO_IDX, IDX_TO_LABEL,
    IMAGENET_MEAN, IMAGENET_STD, SEX_VOCAB, NUM_SEX, SITE_VOCAB, NUM_SITE,
    META_DIM, encode_metadata_vector, encode_metadata_batch,
)
