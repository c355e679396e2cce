from gan_discovery_pso_tpu.pipelines.context import StageContext
from gan_discovery_pso_tpu.pipelines.stages import (
    run_cae,
    load_cae,
    run_classifiers,
    run_dcgan,
    load_gan,
    run_cnn,
    run_cnn_multipatient,
    load_cnn,
    run_inverter,
    load_encoder,
    run_extractor,
    run_pso_inverter,
    run_regularize_inverter,
    run_regularize_inverter_statistics,
    run_vqvae,
    run_pixelcnn_prior,
    run_pixelcnn_prior_from_vqvae,
)
from gan_discovery_pso_tpu.pipelines.pso_discovery import (
    run_pso_discovery,
    run_pso_discovery_batched,
)
from gan_discovery_pso_tpu.pipelines.analysis_stages import (
    run_pso_analysis,
    run_pso_analysis_clustering,
    run_pso_analysis_distance,
    run_pso_inverter_analysis,
    run_claro_preprocess,
)
