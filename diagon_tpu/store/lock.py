"""Single-writer lock (reference ``store/Lock.h`` + write.lock semantics)."""

from __future__ import annotations


class LockObtainFailedError(Exception):
    pass


class Lock:
    """Create-once lock file; released by deletion or context exit."""

    def __init__(self, directory, name: str):
        self.directory = directory
        self.name = name
        self._held = True

    @staticmethod
    def obtain(directory, name: str = "write.lock") -> "Lock":
        if directory.file_exists(name):
            raise LockObtainFailedError(
                f"lock {name!r} already held in {directory}"
            )
        directory.write_bytes(name, b"lock")
        return Lock(directory, name)

    def release(self) -> None:
        if self._held:
            self._held = False
            try:
                self.directory.delete_file(self.name)
            except FileNotFoundError:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
