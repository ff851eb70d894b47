"""Interactive SnelDB query console (``python -m sneldb_spark.cli``).

Parity with the reference's ``sneldb-cli`` binary
(reference: src/bin/sneldb_cli.rs): one-shot ``--query`` / ``--stdin``
modes, an interactive REPL with multiline input (terminate with ``;``
or a blank line), backslash commands (``\\q \\h \\c \\l \\config``),
persistent history, a row display limit, and layered configuration —

1. command-line flags,
2. ``SNELDB_URL`` / ``SNELDB_TOKEN`` / ``SNELDB_USER_ID`` /
   ``SNELDB_SECRET_KEY`` environment variables,
3. a TOML config file at ``~/.sneldb/config`` or ``./.sneldb/config``
   with a ``[config]`` section (url / token / user_id / secret_key),
4. defaults (``http://127.0.0.1:8085``, anonymous).

Auth: ``user_id`` + ``secret_key`` sign each command with HMAC-SHA256
(the server's ``X-Auth-User`` / ``X-Auth-Signature`` headers); a bare
token rides as a session token header. Transport is this package's
dependency-free :class:`sneldb_spark.client.SnelDBClient`, so the same
console also speaks ``tcp://`` / ``ws://`` / ``unix://`` URLs — a
superset of the reference CLI, which is HTTP-only.
"""

from __future__ import annotations

import argparse
import os
import sys
import tomllib
from dataclasses import dataclass
from typing import Optional

from sneldb_spark.client import (
    ClientAuthError,
    ClientError,
    ClientResult,
    SnelDBClient,
)

DEFAULT_URL = "http://127.0.0.1:8085"
HISTORY_FILE = os.path.join(os.path.expanduser("~"), ".sneldb_history")

_AUTH_HELP = """Authentication failed.

To fix this:
  1. Pass user credentials:  --user-id admin --secret-key <key>
  2. Or set environment variables SNELDB_USER_ID / SNELDB_SECRET_KEY
  3. Or create a config file at ~/.sneldb/config:
       [config]
       url = "http://127.0.0.1:8085"
       user_id = "admin"
       secret_key = "your-secret-key"
Check the server config's initial_admin_user / initial_admin_key, or
set bypass_auth = true while bootstrapping users."""


@dataclass
class CliConfig:
    url: str = DEFAULT_URL
    token: Optional[str] = None
    user_id: Optional[str] = None
    secret_key: Optional[str] = None


def _read_config_file() -> dict:
    """``[config]`` section from ~/.sneldb/config, else ./.sneldb/config."""
    for base in (os.path.expanduser("~"), os.getcwd()):
        path = os.path.join(base, ".sneldb", "config")
        try:
            with open(path, "rb") as f:
                doc = tomllib.load(f)
        except (OSError, tomllib.TOMLDecodeError):
            continue
        section = doc.get("config")
        if isinstance(section, dict):
            return section
    return {}


def load_cli_config(args: argparse.Namespace) -> CliConfig:
    """Layer flags over env vars over the config file over defaults."""
    filed = _read_config_file()

    def pick(flag, env, key):
        """Resolve one field; rank says which layer won (0=flag 1=env 2=file)."""
        if flag is not None:
            return flag, 0
        v = os.environ.get(env)
        if v is not None:
            return v, 1
        v = filed.get(key)
        return v, (2 if v is not None else 3)

    url, _ = pick(args.url, "SNELDB_URL", "url")
    token, token_rank = pick(args.token, "SNELDB_TOKEN", "token")
    user_id, uid_rank = pick(args.user_id, "SNELDB_USER_ID", "user_id")
    secret_key, key_rank = pick(args.secret_key, "SNELDB_SECRET_KEY", "secret_key")

    cfg = CliConfig(
        url=url or DEFAULT_URL, token=token, user_id=user_id, secret_key=secret_key
    )
    # Exactly one auth style is used per session. Within one layer a full
    # HMAC pair beats a token (reference priority), but an auth style from
    # a MORE explicit layer always wins — `--token ...` must not be
    # silently discarded because a config file happens to hold stale
    # user_id/secret_key (the pair is only as explicit as its weaker half).
    if cfg.token and cfg.user_id and cfg.secret_key:
        if token_rank < max(uid_rank, key_rank):
            cfg.user_id = cfg.secret_key = None
        else:
            cfg.token = None
    return cfg


def make_client(cfg: CliConfig, timeout: float = 60.0) -> SnelDBClient:
    client = SnelDBClient(
        cfg.url, user_id=cfg.user_id, secret_key=cfg.secret_key, timeout=timeout
    )
    if cfg.token:
        client._token = cfg.token  # pre-minted session token
    return client


def _mask(secret: str) -> str:
    return f"{secret[:4]}...{secret[-4:]}" if len(secret) > 8 else "***"


def format_result(result: ClientResult, limit: int = 0) -> str:
    """Render a ClientResult as an aligned text table (reads) or the ok
    message (writes). `limit` > 0 truncates the displayed rows."""
    if result.columns is None:
        return result.message or "OK"
    cols = result.columns
    rows = result.rows if limit <= 0 else result.rows[:limit]
    cells = [[("" if r.get(c) is None else str(r.get(c))) for c in cols] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "─┼─".join("─" * w for w in widths)
    out = [
        " │ ".join(c.ljust(w) for c, w in zip(cols, widths)),
        sep,
    ]
    out += [" │ ".join(v.ljust(w) for v, w in zip(row, widths)) for row in cells]
    shown = len(rows)
    note = f" (showing {shown})" if shown < result.row_count else ""
    out.append(f"({result.row_count} row{'s' if result.row_count != 1 else ''}{note})")
    return "\n".join(out)


def run_once(client: SnelDBClient, query: str, limit: int) -> int:
    """Execute one command and print it; returns a process exit code."""
    try:
        result = client.execute(query)
    except ClientAuthError as e:
        print(f"Error: {e}\n\n{_AUTH_HELP}", file=sys.stderr)
        return 1
    except (ClientError, OSError) as e:
        # tcp://, ws:// and unix:// transports surface connection failures
        # as raw OSError subclasses (ConnectionRefusedError, timeout, ...)
        print(f"Error: {e}", file=sys.stderr)
        return 1
    print(format_result(result, limit))
    return 0


def _print_help() -> None:
    print(
        "\nSnelDB Console Help\n"
        "───────────────────\n"
        "Special commands:\n"
        "  \\q, \\quit, \\exit    Exit the console\n"
        "  \\h, \\help           Show this help message\n"
        "  \\c, \\clear          Clear the current input buffer/screen\n"
        "  \\l, \\limit [n]      Show or set the row display limit\n"
        "  \\config             Show current configuration\n\n"
        "Query input:\n"
        "  - End queries with a semicolon (;) or press Enter twice\n"
        "  - Ctrl+C cancels the current input, Ctrl+D exits\n"
    )


def _print_config(cfg: CliConfig) -> None:
    print(f"\nCurrent Configuration:\n  URL:   {cfg.url}")
    if cfg.user_id and cfg.secret_key:
        print(
            f"  Auth:  User HMAC (user_id={cfg.user_id}, "
            f"secret_key={_mask(cfg.secret_key)})"
        )
    elif cfg.token:
        print(f"  Auth:  token ({_mask(cfg.token)})")
    else:
        print("  Auth:  none")
    print(
        "\nConfiguration sources (in priority order):\n"
        "  1. Command line arguments\n"
        "  2. Environment variables\n"
        "  3. Config file (~/.sneldb/config or .sneldb/config)\n"
        "  4. Defaults\n"
    )


def run_interactive(client: SnelDBClient, cfg: CliConfig, limit: int) -> int:
    try:  # history + line editing when a readline is available
        import readline

        try:
            readline.read_history_file(HISTORY_FILE)
        except OSError:
            pass
    except ImportError:
        readline = None

    print("SnelDB Interactive Console")
    print("Type '\\h' for help, '\\q' to quit")
    print(f"Connected to: {cfg.url}")
    if cfg.user_id and cfg.secret_key:
        print(
            f"Using user authentication: user_id={cfg.user_id}, "
            f"secret_key={_mask(cfg.secret_key)}\n"
        )
    elif cfg.token:
        print(f"Using token: {_mask(cfg.token)}\n")
    else:
        print("No authentication configured\n")

    buffer: list[str] = []

    def execute(query: str) -> None:
        nonlocal limit
        try:
            print(format_result(client.execute(query), limit))
        except ClientAuthError as e:
            print(f"Error: {e}\n\n{_AUTH_HELP}", file=sys.stderr)
        except (ClientError, OSError) as e:
            print(f"Error: {e}", file=sys.stderr)

    while True:
        prompt = "  -> " if buffer else "sneldb=> "
        try:
            line = input(prompt)
        except KeyboardInterrupt:
            print("^C")
            buffer.clear()
            continue
        except EOFError:
            print("\nGoodbye!")
            break
        stripped = line.strip()

        if not stripped:
            if buffer:  # blank line terminates a multiline query
                query = "\n".join(buffer).strip()
                buffer.clear()
                if query:
                    execute(query)
            continue

        if stripped.startswith("\\") and not buffer:
            parts = stripped[1:].split()
            cmd = parts[0] if parts else ""
            if cmd in ("q", "quit", "exit"):
                print("Goodbye!")
                break
            elif cmd in ("h", "help"):
                _print_help()
            elif cmd in ("c", "clear"):
                buffer.clear()
                print("\x1b[2J\x1b[1;1H", end="")
            elif cmd in ("l", "limit"):
                if len(parts) > 1:
                    try:
                        limit = int(parts[1])
                        print(f"Row limit set to: {limit}")
                    except ValueError:
                        print("Invalid limit value", file=sys.stderr)
                else:
                    print(f"Current row limit: {limit}")
            elif cmd == "config":
                _print_config(cfg)
            else:
                print(f"Unknown command: \\{cmd}. Type \\h for help.", file=sys.stderr)
            continue

        buffer.append(line)
        if stripped.endswith(";"):
            query = "\n".join(buffer).strip().rstrip(";").strip()
            buffer.clear()
            if query:
                execute(query)

    if readline is not None:
        try:
            readline.write_history_file(HISTORY_FILE)
        except OSError:
            pass
    return 0


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="sneldb-cli", description="Interactive SnelDB query console"
    )
    parser.add_argument("-q", "--query", help="execute one command and exit")
    parser.add_argument("-u", "--url", help="server URL (http/tcp/ws/unix)")
    parser.add_argument("-t", "--token", help="session token")
    parser.add_argument("--user-id", dest="user_id", help="HMAC user id")
    parser.add_argument("--secret-key", dest="secret_key", help="HMAC secret key")
    parser.add_argument(
        "--stdin", action="store_true", help="read the command from stdin"
    )
    parser.add_argument(
        "-l", "--limit", type=int, default=0,
        help="max rows to display (0 = unlimited)",
    )
    args = parser.parse_args(argv)
    cfg = load_cli_config(args)

    try:
        client = make_client(cfg)
    except (ClientError, OSError) as e:
        # tcp:// / ws:// / unix:// transports connect eagerly here and
        # surface failures as raw OSError subclasses
        print(f"Error: {e}", file=sys.stderr)
        return 1

    try:
        if args.stdin:
            query = sys.stdin.read().strip()
            if not query:
                print("Error: Query cannot be empty", file=sys.stderr)
                return 1
            return run_once(client, query, args.limit)
        if args.query is not None:
            if not args.query.strip():
                print("Error: Query cannot be empty", file=sys.stderr)
                return 1
            return run_once(client, args.query, args.limit)
        return run_interactive(client, cfg, args.limit)
    finally:
        client.close()


if __name__ == "__main__":
    sys.exit(main())
