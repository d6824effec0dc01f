"""Domain validators: CPF check digits, full-name, password strength.

Behavioral parity with the reference (``app/core/utils.py:13-37``):
- CPF: 11 digits, not all equal, both check digits valid.
- Nome: at least two words.
- Senha: >=8 chars with upper, lower and digit.
"""

from __future__ import annotations

import re


def validar_cpf(cpf: str) -> bool:
    digits = re.sub(r"\D", "", cpf or "")
    if len(digits) != 11 or digits == digits[0] * 11:
        return False
    nums = [int(c) for c in digits]
    for pos in (9, 10):
        weights = range(pos + 1, 1, -1)
        total = sum(n * w for n, w in zip(nums[:pos], weights))
        check = (total * 10) % 11
        if check == 10:
            check = 0
        if check != nums[pos]:
            return False
    return True


def validar_nome(nome: str) -> bool:
    return len((nome or "").strip().split()) >= 2


def validar_forca_senha(senha: str) -> bool:
    if not senha or len(senha) < 8:
        return False
    return (
        re.search(r"[A-Z]", senha) is not None
        and re.search(r"[a-z]", senha) is not None
        and re.search(r"\d", senha) is not None
    )
