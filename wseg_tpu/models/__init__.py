from wseg_tpu.models import resnet38
from wseg_tpu.models.contrast import ContrastNet
from wseg_tpu.models.seam import SEAMNet
from wseg_tpu.models.affinity import AffinityNet
from wseg_tpu.utils.registry import MODELS


def build_model(name: str, **kwargs):
    """Build a registered model by name (reference uses importlib strings,
    e.g. `network.resnet38_contrast`; we accept both those and short names)."""
    aliases = {
        "network.resnet38_contrast": "contrast",
        "network.resnet38_SEAM": "seam",
        "network.resnet38_aff": "affinity",
    }
    return MODELS.get(aliases.get(name, name))(**kwargs)
