from timm.models import layers, registry, helpers, vision_transformer  # noqa
