from gan_discovery_pso_tpu.train.common import (
    make_optimizer,
    bce_from_logits,
    bce_on_probs,
    smooth_positive,
    smooth_negative,
    cross_entropy_loss,
)
from gan_discovery_pso_tpu.train.dcgan import (
    GanTrainState,
    gan_init,
    make_gan_train_scan_step,
    make_gan_train_step,
    make_sampler,
)
from gan_discovery_pso_tpu.train.cnn import (
    CnnTrainState,
    EpochCounts,
    make_cnn_steps,
    train_cnn,
    counts_to_metrics,
)
from gan_discovery_pso_tpu.train.cae import (
    CaeTrainState,
    cae_init,
    make_cae_steps,
    train_cae,
    encode_dataset,
    save_encoded_samples_csv,
)
from gan_discovery_pso_tpu.train.inverter import (
    PixRecState,
    PixFeaRecAdvState,
    make_pix_rec_step,
    make_pix_fea_rec_adv_step,
    r1_penalty,
    invert,
    invert_bn,
)
from gan_discovery_pso_tpu.train.vqvae import (
    VqvaeTrainState,
    vqvae_init,
    make_vqvae_steps,
    train_vqvae,
)
