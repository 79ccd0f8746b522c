from rescan_line_sted_tpu.physics.psf import (  # noqa: F401
    gaussian_psf,
    donut_psf,
    line_excitation_profile,
    stripe_depletion_profile,
    detection_psf,
    effective_psf,
    pinhole_mask,
    slit_profile,
)
from rescan_line_sted_tpu.physics.models import (  # noqa: F401
    EnvelopedStripeModel,
    GaussianDonutModel,
    GaussianStripeModel,
    InterferenceStripeModel,
    PupilDonutModel,
    VectorialDonutModel,
)
from rescan_line_sted_tpu.physics.noise import poisson_counts  # noqa: F401
from rescan_line_sted_tpu.physics.dose import (  # noqa: F401
    DoseReport,
    point_sted_dose,
    line_sted_dose,
)
