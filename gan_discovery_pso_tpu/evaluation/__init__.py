from gan_discovery_pso_tpu.evaluation.fid import (
    mean_and_cov,
    frechet_distance,
    fid_from_features,
)
from gan_discovery_pso_tpu.evaluation.classifiers import (
    KnnBattery,
    train_classifier_battery,
    compute_posterior,
    assign_labels,
    save_battery,
    load_battery,
)
from gan_discovery_pso_tpu.evaluation.gan_eval import (
    inception_score,
    denoise_recon_loss,
    posterior_energy,
    posterior_variance,
    GanEvalResult,
    evaluate_gan_epoch,
)
