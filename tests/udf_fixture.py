"""Python UDF fixture for CREATE FUNCTION ... LANGUAGE PYTHON tests."""


def triple(x: int) -> int:
    return x * 3


def shout(s: str) -> str:
    return (s or "") + "!"
