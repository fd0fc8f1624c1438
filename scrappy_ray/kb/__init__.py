from .model import SelectorSpec, FragmentSpec, KB
from .loader import load_kb, load_kb_file, kb_from_dict

__all__ = ["SelectorSpec", "FragmentSpec", "KB", "load_kb", "load_kb_file", "kb_from_dict"]
