"""SDL keycode constants used by the runtime key handler.

The reference ships the full SDL keycode table as device-side constants
(src/sdl.fut) because its key interpretation runs on the GPU; our handler
runs host-side (engine/api.py:key) so only the bound subset is needed.
Values are the standard SDL2 keycodes: printable keys are their ASCII
codes, non-printable keys are scancode | 0x40000000.
"""

SDLK_SPACE = ord(" ")
SDLK_1 = ord("1")
SDLK_2 = ord("2")
SDLK_a = ord("a")
SDLK_d = ord("d")
SDLK_i = ord("i")
SDLK_k = ord("k")
SDLK_l = ord("l")
SDLK_m = ord("m")
SDLK_n = ord("n")
SDLK_o = ord("o")
SDLK_p = ord("p")
SDLK_s = ord("s")
SDLK_t = ord("t")
SDLK_w = ord("w")
SDLK_x = ord("x")
SDLK_z = ord("z")

_SCANCODE_MASK = 1 << 30
SDLK_RIGHT = 79 | _SCANCODE_MASK
SDLK_LEFT = 80 | _SCANCODE_MASK
SDLK_DOWN = 81 | _SCANCODE_MASK
SDLK_UP = 82 | _SCANCODE_MASK

KEYDOWN = 0  # event code for key-down (liblys.c:92-98 convention)
KEYUP = 1
