from gan_discovery_pso_tpu.models.dcgan import (
    GeneratorDef,
    DiscriminatorDef,
    generator_init,
    generator_apply,
    generator_forward,
    discriminator_init,
    discriminator_apply,
    discriminator_logits,
)
from gan_discovery_pso_tpu.models.encoder import (
    EncoderDef,
    encoder_init,
    encoder_apply,
    encoder_forward,
    EncoderAttGANDef,
    encoder_attgan_init,
    encoder_attgan_apply,
)
from gan_discovery_pso_tpu.models.cae import (
    CAEDef,
    cae_encoder_init,
    cae_encoder_apply,
    cae_decoder_init,
    cae_decoder_apply,
    add_noise,
)
from gan_discovery_pso_tpu.models.resnet import (
    ResNetDef,
    resnet_init,
    resnet_apply,
    resnet_features,
    change_classifier_head,
    AlexNetDef,
    alexnet_init,
    alexnet_apply,
    assessor_apply,
)
from gan_discovery_pso_tpu.models.vqvae import (
    VQVAEGanDef,
    VQVAEDef,
    VQVAEMnistDef,
    get_vqvae,
    vqvae_gan_init,
    vqvae_gan_apply,
    vqvae_gan_encode_indices,
    vqvae_gan_decode_indices,
    vq_straight_through,
    vq_indices,
    vq_loss_terms,
    codebook_init,
    codebook_from_pso,
    load_frozen_decoder,
)
from gan_discovery_pso_tpu.models.layers import count_params
from gan_discovery_pso_tpu.models.pixelcnn import (
    PixelCNNDef,
    pixelcnn_init,
    pixelcnn_apply,
    pixelcnn_loss,
    pixelcnn_generate,
)
