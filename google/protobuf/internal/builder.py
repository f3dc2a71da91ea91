"""Builder: turns a parsed FileDescriptor into message classes inside the
generated module's globals — the two calls every modern *_pb2.py makes."""

from __future__ import annotations

from google.protobuf.descriptor import Descriptor, EnumDescriptor


def _upper_key(fullname: str, package: str) -> str:
    rel = fullname[len(package) + 1 :] if package and fullname.startswith(package) else fullname
    return "_" + rel.replace(".", "_").upper()


def BuildMessageAndEnumDescriptors(file_des, module_globals) -> None:
    schema = file_des.schema
    for fullname in schema.messages:
        module_globals[_upper_key(fullname, schema.package)] = Descriptor(fullname)
    for fullname in schema.enums:
        module_globals[_upper_key(fullname, schema.package)] = EnumDescriptor(fullname)


def BuildTopDescriptorsAndMessages(file_des, module_name, module_globals) -> None:
    from etl_demo_spark.protoshim.messages import build_classes

    schema = file_des.schema
    built = build_classes(schema)
    for fullname, obj in built.items():
        rel = (
            fullname[len(schema.package) + 1 :]
            if schema.package and fullname.startswith(schema.package)
            else fullname
        )
        parts = rel.split(".")
        if len(parts) == 1:
            module_globals[parts[0]] = obj
        else:
            # nested type: expose as attribute of its containing class
            container = module_globals.get(parts[0])
            if container is not None:
                setattr(container, parts[-1], obj)
    # protobuf also exports every enum VALUE as a constant on the enum's
    # containing scope: module level for file-level enums
    # (StateMessage_pb2.PRE_INIT == 0), containing class for nested ones
    for fullname, e in schema.enums.items():
        rel = (
            fullname[len(schema.package) + 1 :]
            if schema.package and fullname.startswith(schema.package)
            else fullname
        )
        parts = rel.split(".")
        target = (
            module_globals
            if len(parts) == 1
            else module_globals.get(parts[0])
        )
        for vname, vnum in e.values:
            if target is module_globals:
                module_globals[vname] = vnum
            elif target is not None:
                setattr(target, vname, vnum)
