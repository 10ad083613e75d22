"""Minimal gfapy stand-in for the reference's usage: `gfapy.Gfa()
.from_file(filename=...)` with `.lines`, `.version`, `.segments`,
`.edges`, where each element stringifies to the raw GFA line
(the reference only ever does `str(line).split("\\t")`)."""


class Gfa:
    def __init__(self):
        self.lines = []
        self.version = None

    def from_file(self, filename: str) -> "Gfa":
        with open(filename) as fh:
            self.lines = [ln.rstrip("\n") for ln in fh if ln.strip()]
        self.version = "gfa1"
        for ln in self.lines:
            if ln.startswith("H") and "VN:Z:" in ln:
                self.version = ln.split("VN:Z:")[1].split()[0]
        return self

    @property
    def segments(self):
        return [ln for ln in self.lines if ln.startswith("S\t")]

    @property
    def edges(self):
        return [ln for ln in self.lines if ln.startswith("L\t")]
