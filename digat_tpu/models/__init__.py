from digat_tpu.models.model import Model

__all__ = ["Model"]
