"""Node-construction DSL — the Python equivalent of the reference's `$`
and `defhtml` authoring surface (nodes.cljc:95-197).

`h(...)` mirrors `$` semantics exactly (nodes_test.cljc:34-117):
  - h("div", ...)            element (name given as str, like keyword head)
  - h(attrs_dict, ...)       first opt a non-node map after name -> attrs
  - h("text", 1, None, 2.0)  non-name head -> text/fragment path: Nones
                             dropped, scalars stringified, >1 -> fragment
  - nested lists             one element -> unwrapped; many -> fragment
  - h(None) -> None

The reference distinguishes keyword heads from other values; here a head
is an element name iff it is passed via the `el()` wrapper or matches the
keyword-ish contract below (plain `h` treats only `el(...)` heads as
names, because Python strings are the text payload type).
"""

from __future__ import annotations

from .constants import FRAGMENT_NAME, TEXT_NAME


class El(str):
    """Marker for element names (the keyword analogue)."""


def el(name: str) -> El:
    return El(name)


def text(value) -> dict:
    return {"name": TEXT_NAME, "value": str(value)}


def fragment(children: list) -> dict:
    return {"name": FRAGMENT_NAME, "children": children}


def _is_node(v) -> bool:
    return isinstance(v, dict) and "name" in v


def _is_attrs(v) -> bool:
    return isinstance(v, dict) and "name" not in v


def _node_from_opt(opt):
    """nodes-from-opt (nodes.cljc:145-159). A None opt hits the :else
    text branch with (str nil) = "" in the reference — NOT "None"
    (nodes.cljc:157-159; reachable only via the element path, since
    nodes-from-opts removes nils first, nodes.cljc:177)."""
    if isinstance(opt, dict):
        return opt
    if isinstance(opt, (list, tuple)):
        if len(opt) > 1:
            return fragment([_node_from_opt(o) for o in opt])
        if len(opt) == 1:
            return _node_from_opt(opt[0])
    return text("" if opt is None else opt)


def h(*opts):
    """The `$` equivalent (nodes.cljc:185-197)."""
    if not opts:
        return None
    head = opts[0]
    if isinstance(head, El):
        # node-from-opts (nodes.cljc:161-174)
        second = opts[1] if len(opts) > 1 else None
        has_attrs = _is_attrs(second)
        children_opts = opts[2:] if has_attrs else opts[1:]
        children = [_node_from_opt(o) for o in children_opts]
        # like the reference, the attrs key is only present when given
        # (parser-produced elements always carry one, DSL nodes may not)
        node = {"name": str(head)}
        if has_attrs:
            node["attrs"] = dict(second)
        if children:
            node["children"] = children
        return node
    # nodes-from-opts (nodes.cljc:176-183)
    nodes = [_node_from_opt(o) for o in opts if o is not None]
    if len(nodes) > 1:
        return fragment(nodes)
    return nodes[0] if nodes else None


def defhtml(fn):
    """Decorator equivalent of the reference macro (nodes.cljc:95-111):
    the wrapped function returns a vector of nodes; the decorated call
    returns rendered HTML. (Rendering is at call time in the reference
    too, despite its docs claiming compile time — SURVEY §2.5.)"""
    from .kernel import serialize_nodes

    def wrapper(*args, **kwargs):
        nodes = fn(*args, **kwargs)
        if not isinstance(nodes, list):
            nodes = [nodes]
        return serialize_nodes(nodes)

    wrapper.__name__ = getattr(fn, "__name__", "defhtml")
    return wrapper
