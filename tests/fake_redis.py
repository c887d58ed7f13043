"""In-process fake Redis server speaking RESP2 for store-backend tests.

Implements the command surface RedisStore uses (GET/SET/DEL/INCRBY/PEXPIRE/
EXPIRE/PING/EVAL) over a real TCP socket. EVAL is emulated by dispatching on
the script's marker comment — the same technique the reference's in-memory
fallback uses to emulate its Lua scripts (redisClient.js:59-91).
"""

from __future__ import annotations

import socket
import threading
import time


class FakeRedisServer:
    def __init__(self, clock=time.time):
        self._clock = clock
        self._kv: dict[bytes, tuple[bytes, float | None]] = {}
        self._hashes: dict[bytes, tuple[dict, float | None]] = {}
        self._lock = threading.Lock()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        self._running = True
        self._conns: list[socket.socket] = []
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        # shutdown-before-close deterministically wakes the blocked accept();
        # plain close() can recycle the fd under it and accept a stray client
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._thread.join(timeout=2.0)
        try:
            self._sock.close()
        except OSError:
            pass
        for conn in self._conns:
            try:
                conn.shutdown(socket.SHUT_RDWR)
                conn.close()
            except OSError:
                pass

    # ------------------------------------------------------------- storage

    def _live(self, key: bytes) -> bytes | None:
        entry = self._kv.get(key)
        if entry is None:
            return None
        value, expires = entry
        if expires is not None and expires <= self._clock():
            del self._kv[key]
            return None
        return value

    # -------------------------------------------------------------- server

    def _serve(self):
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            self._conns.append(conn)
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket):
        buf = b""

        def read_line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            line, buf_rest = buf.split(b"\r\n", 1)
            buf = buf_rest
            return line

        def read_exact(n):
            nonlocal buf
            while len(buf) < n + 2:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            data, buf = buf[:n], buf[n + 2:]
            return data

        try:
            while True:
                line = read_line()
                if not line.startswith(b"*"):
                    conn.sendall(b"-ERR protocol\r\n")
                    return
                argc = int(line[1:])
                args = []
                for _ in range(argc):
                    hdr = read_line()
                    args.append(read_exact(int(hdr[1:])))
                conn.sendall(self._dispatch(args))
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    # ------------------------------------------------------------ commands

    @staticmethod
    def _simple(s: str) -> bytes:
        return f"+{s}\r\n".encode()

    @staticmethod
    def _int(n: int) -> bytes:
        return f":{n}\r\n".encode()

    @staticmethod
    def _bulk(data: bytes | None) -> bytes:
        if data is None:
            return b"$-1\r\n"
        return b"$%d\r\n%s\r\n" % (len(data), data)

    @classmethod
    def _array(cls, items: list[int]) -> bytes:
        return b"*%d\r\n" % len(items) + b"".join(cls._int(i) for i in items)

    def _dispatch(self, args: list[bytes]) -> bytes:
        cmd = args[0].upper()
        with self._lock:
            if cmd == b"PING":
                return self._simple("PONG")
            if cmd == b"GET":
                return self._bulk(self._live(args[1]))
            if cmd == b"SET":
                key, value = args[1], args[2]
                opts = [a.upper() for a in args[3:]]
                ttl = None
                if b"PX" in opts:
                    ttl = self._clock() + int(args[3 + opts.index(b"PX") + 1]) / 1000.0
                elif b"EX" in opts:
                    ttl = self._clock() + int(args[3 + opts.index(b"EX") + 1])
                if b"NX" in opts and self._live(key) is not None:
                    return self._bulk(None)
                self._kv[key] = (value, ttl)
                return self._simple("OK")
            if cmd == b"DEL":
                existed = sum(1 for k in args[1:] if self._live(k) is not None)
                for k in args[1:]:
                    self._kv.pop(k, None)
                return self._int(existed)
            if cmd == b"INCRBY":
                current = int(self._live(args[1]) or b"0")
                new = current + int(args[2])
                expires = self._kv.get(args[1], (None, None))[1] if self._live(args[1]) else None
                self._kv[args[1]] = (str(new).encode(), expires)
                return self._int(new)
            if cmd in (b"PEXPIRE", b"EXPIRE"):
                scale = 1000.0 if cmd == b"PEXPIRE" else 1.0
                if self._live(args[1]) is not None:
                    value, _ = self._kv[args[1]]
                    self._kv[args[1]] = (value, self._clock() + int(args[2]) / scale)
                    return self._int(1)
                return self._int(0)
            if cmd == b"EVAL":
                return self._eval(args)
        return b"-ERR unknown command\r\n"

    def _eval(self, args: list[bytes]) -> bytes:
        script = args[1]
        nkeys = int(args[2])
        keys = args[3:3 + nkeys]
        argv = args[3 + nkeys:]
        if script.startswith(b"-- irp:take"):
            limit, interval_ms, now_ms = (int(a) for a in argv[:3])
            entry = self._hashes.get(keys[0])
            tokens, reset = (None, None) if entry is None else (
                entry[0].get("tokens"), entry[0].get("reset"))
            if reset is None or int(reset) <= now_ms:
                tokens, reset = limit, now_ms + interval_ms
            tokens, reset = int(tokens), int(reset)
            allowed = 0
            if tokens > 0:
                allowed = 1
                tokens -= 1
            self._hashes[keys[0]] = (
                {"tokens": tokens, "reset": reset},
                self._clock() + (reset - now_ms) / 1000.0,
            )
            return self._array([allowed, tokens, reset])
        if script.startswith(b"-- irp:incr_with_limit"):
            limit, ttl = int(argv[0]), int(argv[1])
            current = int(self._live(keys[0]) or b"0")
            if current >= limit:
                return self._int(0)
            new = current + 1
            self._kv[keys[0]] = (str(new).encode(), self._clock() + ttl)
            return self._int(new)
        if script.startswith(b"-- irp:check_and_decrement"):
            amount, ttl = int(argv[0]), int(argv[1])
            current = int(self._live(keys[0]) or b"0")
            if current < amount:
                return self._array([0, current])
            new = current - amount
            self._kv[keys[0]] = (str(new).encode(), self._clock() + ttl)
            return self._array([1, new])
        return b"-ERR unknown script\r\n"
