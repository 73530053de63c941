from .cli import _main_hard_exit

_main_hard_exit()
