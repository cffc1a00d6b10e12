from .parser import SelectorError, parse_selector_list  # noqa: F401
from .matcher import CompiledSelector, compile_selector  # noqa: F401
