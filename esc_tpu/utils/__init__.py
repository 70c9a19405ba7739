from .config import read_yaml, dict2namespace, namespace2dict

__all__ = ["read_yaml", "dict2namespace", "namespace2dict"]
