"""graph_tool.draw stub: rendering is cosmetic-only in the reference
(draw_graph_api); emit nothing rather than pull in a rendering stack."""


def graph_draw(g=None, output=None, **kwargs):  # noqa: D401
    if output:
        try:
            with open(output, "w") as fh:
                fh.write("")  # placeholder artifact
        except OSError:
            pass
