from .config import (read_yaml, dict2namespace, namespace2dict,
                     download_data_hf)

__all__ = ["read_yaml", "dict2namespace", "namespace2dict"]
