from .calculator import Calculator, XequiCalculator
from .export import export_model, load_exported
from .ipi_driver import IPIDriver

__all__ = [
    "Calculator",
    "XequiCalculator",
    "export_model",
    "load_exported",
    "IPIDriver",
]
