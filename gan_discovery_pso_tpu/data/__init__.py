from gan_discovery_pso_tpu.data.mnist import (
    ImageDataset,
    load_mnist,
    epoch_batches,
    train_val_split,
)
from gan_discovery_pso_tpu.data.synthetic_digits import synth_digits
from gan_discovery_pso_tpu.data.medical import (
    ClipSpec,
    square_box,
    crop_box,
    normalize01,
    preprocess_ct_slice,
    prepare_patient_dataset,
)
