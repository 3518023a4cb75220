from . import telco

__all__ = ["telco"]
