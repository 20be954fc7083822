// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

/// @notice The prover-gateway surface VectorX depends on: asynchronous
///         request + synchronous verified read-back (the requestCall /
///         verifiedCall pattern the reference uses at VectorX.sol:202-208,
///         :259-262).
interface ISuccinctGateway {
    function requestCall(
        bytes32 functionId,
        bytes memory input,
        address entryAddress,
        bytes memory entryCalldata,
        uint32 entryGasLimit
    ) external payable;

    function verifiedCall(bytes32 functionId, bytes memory input)
        external
        view
        returns (bytes memory);

    function isCallback() external view returns (bool);
}
