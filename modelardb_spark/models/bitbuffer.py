"""MSB-first bit I/O over a bytearray.

Same wire layout as the reference's BitBuffer
(core/utility/BitBuffer.java, itself derived from the public
gorilla-tsc layout): bits are written into each byte starting at the
most-significant bit; `array()` includes the trailing partial byte.
Reimplemented from scratch in Python with int arithmetic.
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_buf", "_cur", "_bits_left")

    def __init__(self) -> None:
        self._buf = bytearray()
        self._cur = 0
        self._bits_left = 8

    def write_bit(self, bit: int) -> None:
        if bit:
            self._cur |= 1 << (self._bits_left - 1)
        self._bits_left -= 1
        if self._bits_left == 0:
            self._buf.append(self._cur)
            self._cur = 0
            self._bits_left = 8

    def write_bits(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1 if bits < 64 else ~0
        while bits > 0:
            if bits > self._bits_left:
                shift = bits - self._bits_left
                self._cur |= (value >> shift) & ((1 << self._bits_left) - 1)
                bits_written = self._bits_left
            else:
                shift = self._bits_left - bits
                self._cur |= (value << shift) & 0xFF
                bits_written = bits
            bits -= bits_written
            self._bits_left -= bits_written
            if self._bits_left == 0:
                self._buf.append(self._cur)
                self._cur = 0
                self._bits_left = 8

    def to_bytes(self) -> bytes:
        if self._bits_left != 8:
            return bytes(self._buf) + bytes([self._cur])
        return bytes(self._buf)

    def size(self) -> int:
        return len(self._buf) + (1 if self._bits_left != 8 else 0)


class BitReader:
    __slots__ = ("_data", "_pos", "_cur", "_bits_left")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 1
        self._cur = data[0] if data else 0
        self._bits_left = 8

    def _next_byte(self) -> None:
        self._cur = self._data[self._pos]
        self._pos += 1
        self._bits_left = 8

    def read_bit(self) -> int:
        bit = (self._cur >> (self._bits_left - 1)) & 1
        self._bits_left -= 1
        if self._bits_left == 0 and self._pos < len(self._data):
            self._next_byte()
        return bit

    def read_bits(self, bits: int) -> int:
        value = 0
        while bits > 0:
            if bits > self._bits_left or bits == 8:
                d = self._cur & ((1 << self._bits_left) - 1)
                value = (value << self._bits_left) + d
                bits -= self._bits_left
                self._bits_left = 0
            else:
                d = (self._cur >> (self._bits_left - bits)) & ((1 << bits) - 1)
                value = (value << bits) + d
                self._bits_left -= bits
                bits = 0
            if self._bits_left == 0 and self._pos < len(self._data):
                self._next_byte()
        return value
